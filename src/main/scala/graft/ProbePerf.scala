package graft

import org.apache.spark.sql.SparkSession

/** Perf probe: runs named harness queries 3× in one session to split
  * first-run cost (codegen/JIT — every Spark job pays it once) from
  * steady-state execution (the number that scales with data). Use
  * before optimizing anything the bench flags: a query whose run3 is
  * fast has a warm-up artifact, not a plan problem.
  *
  *   sbt "runMain graft.ProbePerf q39_retraction d18_dedup_clusters"
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same tmpfs shuffle dir as Bench — a probe that shuffles to the
      // host's intermittently-degraded disk measures the host
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/orders.parquet").count()
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      println(f"[probe] $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
