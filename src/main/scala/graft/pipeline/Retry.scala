package graft.pipeline

/** Retry with exponential backoff (reference `create-backoff` +
  * `retrying`, `src/cognitect/xform/batch.clj:62-91`): 100 ms → 30 s
  * cap, factor 2; retry on transient ("busy") conditions, give up when
  * the backoff sequence is exhausted. Sleep is injectable for tests. */
object Retry {

  /** Finite stream of backoff millis: start, start*f, ... capped at
    * end; ends after `maxTries` waits (the reference's backoff is
    * unbounded up to the cap; we bound tries to stay testable). */
  def backoff(start: Long = 100, end: Long = 30000, factor: Double = 2.0,
      maxTries: Int = 12): Iterator[Long] =
    Iterator.iterate(start.toDouble)(_ * factor).map(d => math.min(d.toLong, end)).take(maxTries)

  /** Runs `f`; on a transient failure waits the next backoff and
    * retries. Non-transient failures and backoff exhaustion rethrow. */
  def retrying[T](f: () => T, isTransient: Throwable => Boolean,
      backoffs: Iterator[Long] = backoff(), sleep: Long => Unit = Thread.sleep): T = {
    while (true) {
      try return f()
      catch {
        case t: Throwable if isTransient(t) && backoffs.hasNext => sleep(backoffs.next())
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Transient store conditions — the parquet/FS analog of the
    * reference's busy/unavailable/429/503 set (batch.clj:70-75). */
  def transientIo(t: Throwable): Boolean = t match {
    case _: java.io.IOException => true
    case _: org.apache.spark.SparkException =>
      Option(t.getMessage).exists(m =>
        m.contains("Unable to acquire") || m.contains("Connection") || m.contains("timeout"))
    case _ => false
  }
}
