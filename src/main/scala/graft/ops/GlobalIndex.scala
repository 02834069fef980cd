package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Dense 0-based global index following a total order — the scalable
  * replacement for the reference's inherited stream order
  * (`tx-data->batches` counts batches in arrival order,
  * `src/cognitect/xform/batch.clj:31-40`).
  *
  * A `row_number()` window with no partition key moves ALL rows to one
  * partition — correct but a non-starter at 100 TB. This is the
  * classic two-pass shape instead: range-partition by the order key,
  * count per partition (small driver-side array), broadcast the
  * cumulative offsets, then number within partitions. One extra job
  * over the sorted data, no single-machine bottleneck.
  */
object GlobalIndex {

  def withDenseIndex(df: DataFrame, orderCols: Seq[Column], name: String = "row_idx"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
        Iterator((i, it.size.toLong))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
        var k = offsets(i)
        it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
      }
      val schema = StructType(sorted.schema.fields :+ StructField(name, LongType, nullable = false))
      val out = spark.createDataFrame(indexed, schema)
      // materialization happens lazily; caller should unpersist via the
      // returned plan's lifetime — kept simple here since inputs are
      // re-derivable
      out
    } finally ()
  }
}
