import org.apache.spark.sql.SparkSession

/** Dev utility: time individual harness queries at sf0.1 under the
  * Bench session config (2 runs each — cold incl. codegen/JIT, then
  * warm). `sbt "Test/runMain TimeQ q49_retract_entity d28_tfidf"`.
  * TQ_AQE=false disables adaptive execution for plan comparison. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("TQ_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[timeq] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
