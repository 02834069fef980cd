package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) tables: the co-located-join capability.
  *
  * At 100 TB the dominant cost of a repeated big-big join is the
  * shuffle; writing both sides bucketed by the join key (same bucket
  * count) lets every subsequent sort-merge join run with ZERO
  * exchange — the scan itself is the partitioning. This is the Spark
  * analogue of the reference's per-type pre-batched files (each batch
  * file is keyed by entity type and consumed whole —
  * `/root/reference/src/datomic/mbrainz/importer.clj:300-323`): do the
  * expensive placement once at write time, reuse it every read.
  *
  * BucketedSpec pins the plan shape: sort-merge join with no
  * ShuffleExchange on either side.
  */
object Bucketed {

  /** Drop-and-rewrite a managed bucketed table. Overwrite goes through
    * DROP + location delete (Hadoop FileSystem, object-store safe) so
    * a stale warehouse directory from a previous session can't wedge
    * the managed-table create. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // resolve the managed location through the catalog (qualified names
    // and non-default current databases land under <db>.db/<name>, not
    // <warehouse>/<name>)
    val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new Path(s.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition on the bucket key with the bucket count: Spark's
    // repartition hash == bucket-id hash (both murmur3 pmod n), so each
    // task holds exactly one bucket → one file per bucket, not
    // tasks × buckets tiny files (and the bucket-side sort is local)
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Co-located orders⋈customer: both sides bucketed by custkey, merge
    * hint forces the sort-merge path (a broadcast would hide the
    * bucket win at test scale; at 100 TB neither side broadcasts).
    * The join itself is exchange-free; the only shuffle in the query
    * is the final small aggregation. */
  // the graft_bkt_* table names are fixed (the read-side query below
  // must reference them), so overlapping q41 calls would race on the
  // DROP + location delete — serialize the write phase process-wide
  private val writeLock = new Object

  def q41_bucketed_join(s: SparkSession, d: String): DataFrame = {
    // the two table writes are independent jobs — run them concurrently
    // (Spark schedulers handle concurrent jobs in one session); bound
    // the wait so a wedged write fails the query instead of hanging
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    writeLock.synchronized {
      val writes = Seq(
        Future(writeBucketed(graft.sources.Tables.orders(s, d), "graft_bkt_orders", 8, "o_custkey")),
        Future(writeBucketed(graft.sources.Tables.customer(s, d), "graft_bkt_customer", 8, "c_custkey")))
      writes.foreach(Await.result(_, 10.minutes))
    }
    bucketedJoinAgg(s)
  }

  /** The read side alone (assumes tables exist) — what a production
    * pipeline runs per-query once the bucketed write is amortized. */
  def bucketedJoinAgg(s: SparkSession): DataFrame = {
    val o = s.table("graft_bkt_orders")
    val c = s.table("graft_bkt_customer")
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("sum_price"))
  }
}
