package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 0-based global index following a total order — the scalable
  * replacement for the reference's inherited stream order
  * (`tx-data->batches` counts batches in arrival order,
  * `src/cognitect/xform/batch.clj:31-40`).
  *
  * A `row_number()` window with no partition key moves ALL rows to one
  * partition — correct but a non-starter at 100 TB. This is the
  * classic two-pass shape instead: range-partition by the order key,
  * count per partition (small driver-side array), broadcast the
  * cumulative offsets, then number within partitions. One extra pass
  * over the sorted data, no single-machine bottleneck.
  *
  * Both passes run over the SAME RDD instance — this is load-bearing:
  * range-partitioner sampling seeds derive from the RDD id, so a
  * re-derived plan gets different partition boundaries and the
  * offsets would be wrong. Sharing the instance also means the second
  * pass reuses the first pass's shuffle files (no explicit cache, no
  * cache leak).
  */
object GlobalIndex {

  def withDenseIndex(df: DataFrame, orderCols: Seq[Column], name: String = "row_idx"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortedRdd = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*).rdd
    val counts = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val indexed = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Global RUNNING TOTAL of `valueIdx` (a LongType column index into
    * the row) following a total order — same two-pass shape as
    * `withDenseIndex` (an unpartitioned `sum() over (order by ...)`
    * window is the single-partition trap): range-partition on the
    * order key, per-partition totals to the driver (numPartitions
    * longs), broadcast cumulative offsets, then a running sum within
    * each partition. Output column `name` is the INCLUSIVE prefix sum. */
  def withPrefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
      name: String = "running_total"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val vIdx = df.schema.fieldIndex(valueCol)
    val sortedRdd = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*).rdd
    val totals = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.map(_.getLong(vIdx)).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val summed = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    spark.createDataFrame(summed, schema)
  }
}
