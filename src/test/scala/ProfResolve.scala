import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfResolve {
  def tt[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def resolveNew(l: DataFrame, manyAttrs: Seq[String]): DataFrame = {
    val latest = l
      .groupBy(col("e"), col("a"), col("v"))
      .agg(
        max(when(col("op"), col("tx"))).as("assert_tx"),
        max(when(!col("op"), col("tx"))).as("retract_tx"),
        max(col("v_long")).as("v_long"),
        max(col("is_ref")).as("is_ref"))
      .filter(col("assert_tx").isNotNull &&
        (col("retract_tx").isNull || col("assert_tx") >= col("retract_tx")))
    val one0 = latest.filter(!col("a").isInCollection(manyAttrs))
    val mx = one0.groupBy(col("e"), col("a")).agg(max(col("assert_tx")).as("mx_tx"))
    val cand = one0.join(mx, Seq("e", "a")).filter(col("assert_tx") === col("mx_tx"))
    val hv = cand.groupBy(col("e"), col("a")).agg(max(xxhash64(col("v"))).as("hv"))
    val one = cand.join(hv, Seq("e", "a")).filter(xxhash64(col("v")) === col("hv"))
      .select(col("e"), col("a"), col("v"), col("v_long"), col("is_ref"))
    val many = latest.filter(col("a").isInCollection(manyAttrs))
      .select(col("e"), col("a"), col("v"), col("v_long"), col("is_ref"))
    one.unionByName(many)
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables._
    val o = orders(spark, d); val li = lineitem(spark, d)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    val price = (dec(col("o_totalprice"))*100).cast("long")
    val qty = (dec(col("l_quantity"))*100).cast("long")
    val oe = concat(lit("o"), col("o_orderkey").cast("string"))
    val le = concat(lit("l"), col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"), lit("-"),
      col("l_partkey").cast("string"), lit("-"), col("l_suppkey").cast("string"))
    val loe = concat(lit("o"), col("l_orderkey").cast("string"))
    def datoms(e: org.apache.spark.sql.Column, a: String, v: org.apache.spark.sql.Column,
        vLong: org.apache.spark.sql.Column, isRef: Boolean, src: DataFrame) =
      src.select(e.as("e"), lit(a).as("a"), v.cast("string").as("v"),
        vLong.as("v_long"), lit(isRef).as("is_ref"), lit(1L).as("tx"), lit(true).as("op"))
    val log = datoms(oe, "order/price", price, price, isRef=false, o)
      .unionByName(datoms(loe, "order/line", le, lit(null).cast("long"), isRef=true, li))
      .unionByName(datoms(le, "line/qty", qty, qty, isRef=false, li))
      .unionByName(datoms(concat(lit("c"), col("o_custkey").cast("string")),
        "cust/order", oe, lit(null).cast("long"), isRef=true, o))
      .withColumn("op", lit(true))
    val many = Seq("order/line", "cust/order")
    for (i <- 1 to 3) {
      tt(s"NEW hash resolve $i")(resolveNew(log, many).groupBy(col("a")).agg(count(lit(1))).collect())
      tt(s"OLD sort resolve $i")(graft.store.Store.resolve(log, many).groupBy(col("a")).agg(count(lit(1))).collect())
    }
    // equality check
    val a1 = graft.store.Store.resolve(log, many)
    val b1 = resolveNew(log, many)
    println("diff rows: " + a1.exceptAll(b1).count() + " / " + b1.exceptAll(a1).count())
    spark.stop()
  }
}
