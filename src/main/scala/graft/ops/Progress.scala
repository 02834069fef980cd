package graft.ops

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Progress heartbeat (reference `dot` transducer,
  * `src/cognitect/xform/transducers.clj:29-47`: at most one tick per
  * interval). Spark-side: a SparkListener folding task output metrics,
  * reporting at a bounded rate — observability without touching the
  * data path (no per-row closures). */
final class Progress(spark: SparkSession, label: String, intervalMs: Long = 1000,
    report: String => Unit = s => System.err.println(s)) extends AutoCloseable {

  private val records = new AtomicLong(0)
  private val lastTick = new AtomicLong(System.nanoTime())

  private val listener = new SparkListener {
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        val n = records.addAndGet(m.outputMetrics.recordsWritten +
          m.shuffleWriteMetrics.recordsWritten)
        val now = System.nanoTime()
        val last = lastTick.get()
        if (now - last >= intervalMs * 1000000L && lastTick.compareAndSet(last, now))
          report(s"[$label] ~$n records processed")
      }
    }
  }

  spark.sparkContext.addSparkListener(listener)
  def total: Long = records.get()
  override def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}
