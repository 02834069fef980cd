package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected queries to files — the
  * plan-evidence artifact behind `plans/r{N}/<query>_{before,after}.txt`
  * (optimization rounds). Construction only, nothing executes.
  *
  *   SPARK_GRAFT_ONLY=q49,d60 SPARK_GRAFT_EXPLAIN_OUT=/root/repo/plans/r12 \
  *   SPARK_GRAFT_EXPLAIN_SUFFIX=_before \
  *     sbt -batch "runMain graft.ExplainDump"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_OUT", "/tmp/plans")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    new java.io.File(out).mkdirs()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.exists(name.contains))) {
      try {
        val txt = fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.PrintWriter(s"$out/$name$suffix.txt")
        try f.write(txt) finally f.close()
        println(s"[explain] wrote $out/$name$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
