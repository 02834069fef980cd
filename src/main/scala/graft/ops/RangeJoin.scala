package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — the other temporal/interval join Spark lacks
  * a scalable built-in for (brief §custom operators): points against
  * intervals (`start ≤ t < end`). A naive `points.join(intervals,
  * $"t" >= $"start" && $"t" < $"end")` plans as a nested-loop over
  * every (point, interval) pair — quadratic.
  *
  * The scale path: quantize time into fixed-width buckets, explode
  * each interval over the buckets it covers (`sequence(floor(start/w),
  * floor((end-1)/w))`), equi-join point buckets against interval
  * buckets, and post-filter the exact predicate. Shuffle is keyed on
  * the bucket and proportional to points + Σ interval-spans/width —
  * pick `bucketWidth` near the median interval length so most
  * intervals explode to O(1) buckets.
  */
object RangeJoin {

  /** Join `points` (with long column `timeCol`) to `intervals` (with
    * long columns `startCol`, `endCol`; half-open `[start, end)`),
    * optionally also equi-joining on shared `keys`. Returns every
    * matching (point, interval) pair with all columns from both sides
    * (non-key column sets must be disjoint). Bucket math is integer
    * `div` — double division loses low bits on epoch-nano longs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      timeCol: String, startCol: String, endCol: String,
      bucketWidth: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", expr(s"`$timeCol` div $bucketWidth"))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"(`$endCol` - 1) div $bucketWidth"))))
    p.join(iv, "__bucket" +: keys)
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }
}
