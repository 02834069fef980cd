package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table reader for the harness testdata (TESTDATA.md).
  *
  * Mirrors the reference's source layer (`src/cognitect/xform/async_edn.clj:27-51`
  * streams records from a file): here the "stream" is a partitioned
  * parquet scan — Catalyst prunes columns and pushes filters into it,
  * so callers should `.select`/`.filter` directly on the returned
  * DataFrame rather than materializing.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet `ts` has shipped in two physical forms:
    * TIMESTAMP(NANOS) (readable only as epoch-nanos LongType via
    * `spark.sql.legacy.parquet.nanosAsLong`) and, since the
    * 2026-08-13 testdata regeneration, TIMESTAMP(MICROS) without
    * timezone (Spark reads TIMESTAMP_NTZ). The engine-wide event-time
    * convention stays **epoch-NANOS LongType** — this one reader
    * normalizes, so every consumer (q19/q21/q42, the streaming twins,
    * DuckDB oracle parity via `epoch_ns(ts)`) keeps a single unit.
    * NTZ carries no zone and is interpreted as UTC — guarded, because
    * the NTZ→timestamp cast reads the session zone. The projection is
    * pruned away when a query never touches `ts`. */
  /** Batch open of an events parquet path, rethrowing Spark's opaque
    * schema-converter failure for legacy TIMESTAMP(NANOS) files read
    * without the nanosAsLong flag ("Illegal Parquet type: INT64
    * (TIMESTAMP(NANOS,...))") with the actionable hint. Shared with
    * `Streams.readEvents`, which uses it as its physical-form probe. */
  private[graft] def openEvents(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(path)
    catch {
      case e: Exception
          if Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
            .take(5).exists(t => String.valueOf(t.getMessage).contains("Illegal Parquet type")) =>
        throw new IllegalArgumentException(
          s"$path: ts is legacy TIMESTAMP(NANOS) — set " +
            "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession " +
            "to read it as epoch-nanos longs", e)
    }

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = openEvents(s, s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // legacy nanos-as-long
      case _ =>
        require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events.ts is TIMESTAMP_NTZ (interpreted as UTC): set " +
            "spark.sql.session.timeZone=UTC when building the SparkSession")
        import org.apache.spark.sql.functions.{col, unix_micros}
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
