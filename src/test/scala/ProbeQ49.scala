import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage budget for q49_retract_entity at sf0.1 — times
  * each phase of the pipeline separately (checkpoint, closure,
  * retractions, resolve, final agg) to attribute the wall clock. */
object ProbeQ49 {
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
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q49probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // JIT warmup
    for (_ <- 1 to 2) graft.SparkEntry.queries("q49_retract_entity")(spark, d).count()

    import graft.queries.Relational
    val o = spark.read.parquet(s"$d/orders.parquet")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val oe = concat(lit("o"), col("o_orderkey").cast("string"))
    val le = concat(lit("l"), col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"), lit("-"),
      col("l_partkey").cast("string"), lit("-"), col("l_suppkey").cast("string"))
    val price = (col("o_totalprice") * 100).cast("long")
    val qty = (col("l_quantity") * 100).cast("long")
    def datoms(e: org.apache.spark.sql.Column, a: String, v: org.apache.spark.sql.Column,
        vLong: org.apache.spark.sql.Column, isRef: Boolean, src: org.apache.spark.sql.DataFrame) =
      src.select(e.as("e"), lit(a).as("a"), v.cast("string").as("v"),
        vLong.as("v_long"), lit(isRef).as("is_ref"))
    val loe = concat(lit("o"), col("l_orderkey").cast("string"))
    val narrow0 = datoms(oe, "order/price", lit(null), price, isRef = false, o)
      .unionByName(datoms(loe, "order/line", le, lit(null).cast("long"), isRef = true, li))
      .unionByName(datoms(le, "line/qty", lit(null), qty, isRef = false, li))
      .unionByName(datoms(concat(lit("c"), col("o_custkey").cast("string")),
        "cust/order", oe, lit(null).cast("long"), isRef = true, o))
    val narrow = t("checkpoint") { narrow0.localCheckpoint() }
    val log = narrow
      .withColumn("v", coalesce(col("v"), col("v_long").cast("string")))
      .withColumn("tx", lit(1L)).withColumn("op", lit(true))
    val targets = o.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(concat(lit("o"), col("o_orderkey").cast("string")).as("e"))
    val retractions = t("retractEntityTx(lazy+closure)") {
      graft.store.Store.retractEntityTx(log, targets,
        componentAttrs = Seq("order/line"), tx = 2L)
    }
    val nret = t("retractions.count") { retractions.count() }
    println(s"[q49probe] retractions = $nret")
    val resolved = graft.store.Store.resolve(log.unionByName(retractions),
      manyAttrs = Seq("order/line", "cust/order"))
    t("resolve.count") { resolved.count() }
    val out = resolved
      .groupBy(col("a"), col("e"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("v_long")), lit(0L)).as("sv"))
      .groupBy(col("a"))
      .agg(sum(col("n")).cast("long").as("n_datoms"),
        count(lit(1)).as("n_entities"), sum(col("sv")).cast("long").as("total_v"))
    t("full query end-to-end") {
      graft.SparkEntry.queries("q49_retract_entity")(spark, d).count()
    }
    t("agg-after-resolve (resolve recomputed)") { out.count() }
    spark.stop()
  }
}
