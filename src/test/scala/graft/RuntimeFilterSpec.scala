package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime row-level filtering (bloom pruning): when one join side is
  * selectively filtered, Catalyst can inject a bloom filter built from
  * that side into the OTHER side's scan — rows that can't join are
  * dropped before the shuffle. At 100 TB this turns a full-fact-table
  * shuffle into a shuffle of the matching slice. The thresholds are
  * sized for clusters (creation side ≤ 10 MB plan size, application
  * side ≥ 10 GB scan), so the test lowers them to demonstrate the
  * mechanism on test data; production leaves the defaults. */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom might_contain into the fact scan") {
    TestSpark.withConfs(Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // broadcast would bypass the shuffle (and the bloom's reason to exist)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val big = graft.sources.Tables.lineitem(spark, sf)
      val dim = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 450000.0) // selective creation side (top ~few %)
      val joined = big.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "expected a runtime bloom filter on the fact side:\n" + optimized.take(1500))
      // and it must not change the answer
      val n = joined.agg(sum("n")).collect()(0).getLong(0)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n2 = big.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
      assert(n === n2)
    }
  }
}
