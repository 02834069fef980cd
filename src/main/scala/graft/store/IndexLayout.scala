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
}
