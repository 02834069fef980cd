package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.{IndexLayout, Store}

/** The materialized AVET layout must serve exactly what the live
  * filter path serves — build → read round trip against
  * [[Store.indexRange]] on the same state. */
class IndexLayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("avetRange over the layout ≡ live indexRange over the state") {
    val state = (1L to 200L).flatMap { i =>
      Seq(("e" + i, "order/price", (i * 37).toString, i * 37),
        ("e" + i, "order/bucket", (i % 7).toString, i % 7))
    }.toDF("e", "a", "v", "v_long")
      .withColumn("is_ref", lit(false))
      .withColumn("tx", lit(1L)).withColumn("op", lit(true))
    val path = java.nio.file.Files.createTempDirectory("avet-spec").toString
    IndexLayout.materializeAvet(state, path, buckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("e", "v_long").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val live = rows(Store.indexRange(state, "order/price", 1000L, 3000L))
    val layout = rows(IndexLayout.avetRange(spark, path, "order/price", 1000L, 3000L))
    assert(layout == live)
    assert(live.nonEmpty && live.forall { case (_, v) => v >= 1000L && v < 3000L })
  }
}
