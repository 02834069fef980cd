package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong
object ExecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inRec = new AtomicLong; val inBytes = new AtomicLong
    val shW = new AtomicLong; val shR = new AtomicLong; val nStages = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        inRec.addAndGet(m.inputMetrics.recordsRead)
        inBytes.addAndGet(m.inputMetrics.bytesRead)
        shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        nStages.incrementAndGet()
      }
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "q81_restore_audit")
      .split(",").toSeq
    for (name <- names) {
      inRec.set(0); inBytes.set(0); shW.set(0); shR.set(0); nStages.set(0)
      val df = SparkEntry.queries(name)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(800) // let the listener bus drain stage events
      println(f"[probe] $name%-28s stages=${nStages.get}%3d inputRecords=${inRec.get}%9d " +
        f"inputMB=${inBytes.get/1e6}%8.1f shufWriteMB=${shW.get/1e6}%7.1f shufReadMB=${shR.get/1e6}%7.1f")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
