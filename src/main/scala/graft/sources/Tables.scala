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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; it must be read as epoch-nanos
    * LongType via `spark.sql.legacy.parquet.nanosAsLong`. That is a
    * SESSION conf the schema converter reads (not a per-scan option),
    * so it belongs in the session builder — mutating it here as a
    * read side effect would spookily change other readers in flight. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): set spark.sql.legacy.parquet.nanosAsLong=true " +
        "when building the SparkSession")
    t(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
