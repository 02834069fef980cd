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

  test("compactTail merges the tail and rewrites ONLY touched bucket dirs") {
    def datoms(is: Seq[Long], attr: String) = is.map { i =>
      ("e" + i, attr, (i * 37).toString, i * 37)
    }.toDF("e", "a", "v", "v_long")
      .withColumn("is_ref", lit(false))
      .withColumn("tx", lit(1L)).withColumn("op", lit(true))
    val base = datoms(1L to 400L, "order/price")
    // tail lands entirely in the TOP of the key space → only the last
    // bucket(s) should be rewritten
    val tail = datoms(401L to 440L, "order/price")
    val path = java.nio.file.Files.createTempDirectory("avet-compact").toString
    IndexLayout.materializeAvetBucketed(base, path, buckets = 8)
    def fileStamps(): Map[String, Long] = {
      val root = new java.io.File(path)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath.stripPrefix(path) -> f.lastModified()).toMap
    }
    val before = fileStamps()
    IndexLayout.compactTail(spark, path, tail)
    val after = fileStamps()
    // merged read sees base ∪ tail exactly once each
    val all = IndexLayout.avetRangeBucketed(spark, path, "order/price",
      Long.MinValue, Long.MaxValue)
    assert(all.count() == 440L)
    assert(all.select("e").distinct().count() == 440L)
    // at least one bucket survived untouched: same file, same mtime
    val untouched = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(untouched.nonEmpty,
      s"expected untouched bucket files; before=${before.keySet.size} after=${after.keySet.size}")
    // and something WAS rewritten (the touched bucket)
    assert(after.keySet.diff(before.keySet).nonEmpty || before.exists {
      case (k, t) => after.get(k).exists(_ != t)
    })
  }
}
