package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

/** Physical-plan regression tests — the 100 TB posture is enforced
  * here, not just described: filters reach the parquet scan, scans
  * prune columns, small dims broadcast, anti joins stay anti, and the
  * hot paths run inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: scan prunes to the 6 referenced lineitem columns and pushes the filter") {
    val p = plan(Relational.q01_pricing_summary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"), readSchema)
  }

  test("q02: predicate pushdown on orders") {
    val p = plan(Relational.q02_filter_project(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), EqualTo(o_orderstatus,O)"), p)
  }

  test("q03/q20: dimension joins are broadcast, not shuffled") {
    assert(plan(Relational.q03_enum_broadcast_join(spark, sf)).contains("BroadcastHashJoin"))
    val star = plan(Relational.q20_star_join(spark, sf))
    assert(star.contains("BroadcastHashJoin"), star.take(500))
  }

  test("q08: ledger resume is a real anti join") {
    val p = plan(Relational.q08_ledger_anti_join(spark, sf))
    assert(p.contains("LeftAnti"), p.take(500))
  }

  test("q09: semi join stays semi") {
    assert(plan(Relational.q09_semi_join(spark, sf)).contains("LeftSemi"))
  }

  test("aggregates are partial (map-side) before the shuffle") {
    val p = plan(Relational.q01_pricing_summary(spark, sf))
    assert(p.contains("HashAggregate"), p.take(300))
    // partial + final pairs ⇒ at least two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("hot paths are inside whole-stage codegen") {
    // codegen markers ("*(n)") only appear once AQE finalizes; execute first
    val df = Relational.q01_pricing_summary(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(500))
  }

  test("q14: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.q14_topk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }
}
