package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin

/** As-of join semantics: greatest right time ≤ left time per key,
  * ties visible, no prior state → null, one keyed shuffle. */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val probes = Seq(
    ("u1", 5L, "p1"), ("u1", 10L, "p2"), ("u1", 20L, "p3"),
    ("u2", 7L, "p4"), // u2 has no state at all
    ("u3", 3L, "p5")) // state exists but only later
    .toDF("k", "t", "probe_id")

  private lazy val states = Seq(
    ("u1", 5L, "s@5"), ("u1", 12L, "s@12"),
    ("u3", 9L, "s@9"))
    .toDF("k", "t", "state")

  test("picks the greatest state time <= probe time; equal times match") {
    val out = AsofJoin.leftAsof(probes, states, Seq("k"), "t", "t", Seq("state"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out == Map(
      "p1" -> Some("s@5"),   // tie: state at t=5 visible to probe at t=5
      "p2" -> Some("s@5"),   // s@12 is in the future
      "p3" -> Some("s@12"),
      "p4" -> None,          // no state for u2
      "p5" -> None),         // u3's state arrives after the probe
      out.toString)
  }

  test("randomized equivalence with reference as-of semantics (seed 42)") {
    val rnd = new scala.util.Random(42)
    val ks = Seq("a", "b", "c", "d")
    val pts = (1 to 300).map(i => (ks(rnd.nextInt(ks.size)), rnd.nextInt(60).toLong, s"p$i"))
    // states deduped per (k, t): keep the max id, as the operator doc requires
    val sts = (1 to 150).map(i => (ks(rnd.nextInt(ks.size)), rnd.nextInt(60).toLong, s"s$i"))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val got = AsofJoin.leftAsof(
        pts.toDF("k", "t", "pid"), sts.toDF("k", "t", "state"),
        Seq("k"), "t", "t", Seq("state"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    val byKey = sts.groupBy(_._1)
    pts.foreach { case (k, t, pid) =>
      val expected = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(s => (s._2, s._3)).lastOption.map(_._3)
      assert(got(pid) == expected, s"point $pid (k=$k t=$t)")
    }
  }

  test("a null field in the matched right row stays null — no stitching across rows") {
    import org.apache.spark.sql.functions.col
    val right = Seq(
      ("k1", 1L, Some("bid7"), Some("ask8")),
      ("k1", 5L, None: Option[String], Some("ask9")))
      .toDF("k", "t", "bid", "ask")
    val left = Seq(("k1", 6L, "p1")).toDF("k", "t", "pid")
    val row = AsofJoin.leftAsof(left, right, Seq("k"), "t", "t", Seq("bid", "ask"))
      .select(col("asof_bid"), col("asof_ask")).collect()(0)
    // the as-of match is the t=5 row: bid must be ITS null, not the
    // older row's bid7; ask must be ask9
    assert(row.isNullAt(0), row.toString)
    assert(row.getString(1) == "ask9", row.toString)
  }

  test("one keyed shuffle, no nested-loop or range cross product") {
    val df = AsofJoin.leftAsof(probes, states, Seq("k"), "t", "t", Seq("state"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }
}
