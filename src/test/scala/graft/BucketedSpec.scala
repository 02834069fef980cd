package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Bucketed tables = the co-located-join capability: after a one-time
  * bucketed write, every join on the bucket key runs with ZERO
  * shuffle on either side — the plan shape that makes a repeated
  * big-big join survive 100 TB. */
class BucketedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case q: QueryStageExec => collectNodes(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes)
  }

  test("q41: the bucketed join is sort-merge with no exchange on either side") {
    val df = graft.ops.Bucketed.q41_bucketed_join(spark, sf)
    df.collect() // finalize AQE
    val nodes = collectNodes(df.queryExecution.executedPlan)
    val smj = nodes.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected a sort-merge join, got:\n" +
      df.queryExecution.executedPlan.toString.take(1500))
    val joinSubtree = collectNodes(smj.get)
    assert(!joinSubtree.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "bucketed join must not shuffle either side:\n" + smj.get.toString.take(1500))
    // the only exchange in the whole query is the final small aggregation
    val exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchanges <= 1, s"expected at most the agg exchange, got $exchanges")
  }

  test("q41 results match a plain (non-bucketed) join") {
    val bucketed = graft.ops.Bucketed.q41_bucketed_join(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    import org.apache.spark.sql.functions._
    val plain = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(bucketed.sameElements(plain))
  }

  test("bucketed rewrite is idempotent (drop + recreate survives stale state)") {
    val first = graft.ops.Bucketed.q41_bucketed_join(spark, sf).count()
    val second = graft.ops.Bucketed.q41_bucketed_join(spark, sf).count()
    assert(first === second)
  }
}
