package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Datomic's covering indexes as PHYSICAL parquet layouts. The live
  * store answers `index-range`/`datoms` by filtering the log view
  * ([[Store.indexRange]]); at 100 TB the index must be a LAYOUT, not
  * a filter — Datomic itself keeps EAVT/AEVT/AVET/VAET as separately
  * sorted segment trees precisely so a range read touches only the
  * segments that can hold it. Here that becomes: range-cluster the
  * resolved state on the index's sort key and persist; every file
  * then covers a disjoint key range, parquet row-group min/max
  * statistics mirror the clustering, and a range predicate prunes at
  * BOTH levels (Spark file skipping + row-group skipping) before any
  * row is read. The same write also sorts within partitions, so scans
  * that do survive pruning read key-clustered pages (fast predicate
  * evaluation, high compression).
  */
object IndexLayout {

  /** Persist the AVET layout: files clustered by (a, v_long). On a
    * cluster this is the index-build job — one range-shuffle of the
    * state, embarrassingly parallel writes, no driver involvement. */
  def materializeAvet(state: DataFrame, path: String, buckets: Int): Unit =
    state.repartitionByRange(buckets, col("a"), col("v_long"))
      .sortWithinPartitions(col("a"), col("v_long"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** `d/index-range` against the materialized layout: a plain read
    * whose (a, v_long) predicates push down to the parquet scan —
    * `.explain` shows them in PushedFilters, and the clustered layout
    * turns them into skipped files/row-groups rather than row-level
    * work. Half-open [vFrom, vUntil) like the live path. */
  def avetRange(spark: SparkSession, path: String, a: String,
      vFrom: Long, vUntil: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("a") === a && col("v_long") >= vFrom && col("v_long") < vUntil)

  /** Datomic's fulltext index (a Lucene tree beside the EAVT store)
    * re-expressed the same way as the AVET layout: an inverted
    * POSTING-LIST table — one row per (term, doc), clustered on the
    * term's hash. The live `fulltext` Datalog function scans text;
    * at 100 TB search must touch only the postings of the queried
    * terms, so the build range-clusters postings on `term_hash` and
    * a term lookup becomes an IN-filter that parquet file/row-group
    * statistics resolve to a handful of files — the inverted index's
    * seek, re-expressed as layout + pushdown. Tokenization matches
    * `fulltext` (lowercase, split on non-alphanumeric). */
  def materializePostings(docs: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int): Unit =
    docs.select(col(idCol).as("doc_id"),
        explode_outer(expr(
          s"filter(split(lower($textCol), '[^a-z0-9]+'), w -> w <> '')")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("term_hash", xxhash64(col("term")))
      .repartitionByRange(buckets, col("term_hash"))
      .sortWithinPartitions(col("term_hash"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Term lookup against the layout: the `term_hash` IN-list pushes
    * down (file + row-group skipping); the string equality guards
    * hash collisions AFTER pruning. Returns (term, doc_id, tf). */
  /** Two-dimensional clustering: order by the Morton interleave of two
    * pre-scaled keys ([[graft.functions.ZOrder64]]), so contiguous key
    * ranges are small RECTANGLES in (a, b) space and every persisted
    * file carries narrow min/max statistics in BOTH raw columns — a
    * predicate on either dimension (or both) then resolves at the
    * scan via row-group statistics instead of row-level work. This is
    * the standard lakehouse Z-ORDER; 1-D range clustering
    * ([[materializeAvet]]) can only make one access path prunable,
    * and the events table has two (by user, by time). The z key
    * exists only at WRITE time — reads filter the raw columns, which
    * is what keeps both predicates pushable. */
  def materializeZorder(df: DataFrame, aCol: String, bCol: String,
      path: String, buckets: Int): Unit = {
    graft.functions.ZOrderExprs.register(df.sparkSession)
    df.withColumn("__z",
        expr(s"zorder64(cast($aCol as bigint), cast($bCol as bigint))"))
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def postingsLookup(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    // xxhash64(lit(t)) constant-folds to a long literal, so the whole
    // disjunction reaches the scan as a pushable In/Or over term_hash
    val hashPred = terms.map(t => col("term_hash") === xxhash64(lit(t)))
      .reduce(_ || _)
    spark.read.parquet(path)
      .filter(hashPred && col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
  }
}
