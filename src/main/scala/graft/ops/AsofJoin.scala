package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join — the temporal join Spark has no built-in operator
  * for (brief §custom operators): for every left row, attach values
  * from the single right row with the greatest `rightTime` ≤
  * `leftTime` in the same key group (probe events against a
  * slowly-changing dimension, trades against quotes, …).
  *
  * Plan shape: union both sides tagged, ONE shuffle on the key, a
  * running `last(_, ignoreNulls)` window forward-fills the right
  * values in (time, side) order, then the right rows drop out. Never
  * builds a per-key cross product and never range-joins — cost is
  * sort + linear scan per key group, the same shape a native as-of
  * physical operator would have. Right rows at equal time sort before
  * left rows, so ties are visible (≤ semantics); the caller should
  * dedupe the right side per (key, time) to keep the pick
  * deterministic.
  */
object AsofJoin {

  def leftAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, pick: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val lu = left.select(
      keys.map(col) ++
        Seq(col(leftTime).cast("long").as("__t"), lit(1).as("__side")) ++
        leftPayload.map(c => col(c).as(s"__l_$c")) ++
        pick.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val ru = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("long").as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        pick.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward-fill ONE struct per right row — filling each picked
    // column independently would skip a genuinely-null field back to
    // an OLDER right row and stitch together a row that never existed
    lu.unionByName(ru)
      .withColumn("__r", when(col("__side") === 0,
        struct(pick.map(c => col(s"__r_$c").as(c)): _*)))
      .select(
        keys.map(col) ++
          Seq(col("__side")) ++
          leftPayload.map(c => col(s"__l_$c")) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__match"): _*)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          leftPayload.map(c => col(s"__l_$c").as(c)) ++
          pick.map(c => col(s"__match.$c").as(prefix + c)): _*)
  }
}
