package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** Bucketed range join: half-open boundary semantics, equivalence to
  * the naive inequality join, and the plan staying hash-keyed. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    ("k1", 0L, "p0"), ("k1", 9L, "p9"), ("k1", 10L, "p10"),
    ("k1", 25L, "p25"), ("k2", 9L, "q9"))
    .toDF("k", "t", "pid")

  private lazy val intervals = Seq(
    ("k1", 0L, 10L, "i0_10"),   // [0,10): catches p0, p9; NOT p10
    ("k1", 9L, 26L, "i9_26"),   // crosses bucket boundary; catches p9, p10, p25
    ("k2", 0L, 10L, "j0_10"),   // other key: only q9
    ("k1", 5L, 5L, "empty"))    // degenerate: matches nothing
    .toDF("k", "s", "e", "iid")

  test("half-open [start, end) with keys; spans crossing buckets still match") {
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      bucketWidth = 10L, keys = Seq("k"))
      .select(col("iid"), col("pid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("i0_10", "p0"), ("i0_10", "p9"),
      ("i9_26", "p9"), ("i9_26", "p10"), ("i9_26", "p25"),
      ("j0_10", "q9")), got.toString)
  }

  test("randomized equivalence with the naive inequality join (seed 7)") {
    val rnd = new scala.util.Random(7)
    val ks = Seq("a", "b", "c")
    val pts = (1 to 250).map(i => (ks(rnd.nextInt(3)), rnd.nextInt(100).toLong, s"p$i"))
      .toDF("k", "t", "pid")
    val ivs = (1 to 120).map { i =>
      val s = rnd.nextInt(100).toLong
      (ks(rnd.nextInt(3)), s, s + rnd.nextInt(30).toLong, s"i$i")
    }.toDF("k", "s", "e", "iid")
    for (width <- Seq(1L, 7L, 64L)) {
      val bucketed = RangeJoin.pointInInterval(pts, ivs, "t", "s", "e", width, Seq("k"))
        .select(col("iid"), col("pid"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val naive = pts.as("p").join(ivs.as("i"),
          col("p.k") === col("i.k") && col("p.t") >= col("i.s") && col("p.t") < col("i.e"))
        .select(col("i.iid"), col("p.pid"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(bucketed == naive, s"width=$width")
    }
  }

  test("equals the naive inequality join; plans hash-keyed, not nested-loop") {
    val bucketed = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      bucketWidth = 7L, keys = Seq("k"))
      .select(col("iid"), col("pid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("i.s") && col("p.t") < col("i.e"))
      .select(col("i.iid"), col("p.pid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(bucketed == naive, s"bucketed=$bucketed naive=$naive")
    val plan = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 7L, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
