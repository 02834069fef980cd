package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashExprs

/** Pins the native expressions to the higher-order-function formulas
  * they replaced — bit-identical signatures mean LSH buckets, pair
  * tables, and every downstream test keep their semantics. */
class HashExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    "this is a long shared document about spark engines " * 4,
    "short", "", "ünïcødé text with Ümläute and 中文字符 mixed in",
    "punctuation!!! and   spacing\t\tvariations...").toDF("text")

  test("minhash_sig equals the expression formula") {
    HashExprs.register(spark)
    val comps = (0 until 32).map(i =>
      s"array_min(transform(hs, h -> xxhash64(h, ${i}L)))").mkString(", ")
    val formula =
      s"""transform(array(transform(
            array_distinct(transform(sequence(1, greatest(length(text)-4, 1)),
              i -> substring(text, i, 5))),
            g -> xxhash64(g))), hs -> array($comps))[0]"""
    val rows = docs.filter(length(col("text")) > 0)
      .select(expr("minhash_sig(text)").as("native"), expr(formula).as("formula"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("simhash64 equals the expression formula") {
    HashExprs.register(spark)
    val formula =
      """transform(array(transform(
           filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0),
           t -> xxhash64(t))), ths ->
           aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
             acc | if(aggregate(ths, 0, (s, h) ->
                        s + if((shiftright(h, i) & 1) = 1, 1, -1)) > 0,
                      shiftleft(cast(1 as bigint), i), cast(0 as bigint))))[0]"""
    val rows = docs.select(expr("simhash64(text)"), expr(formula)).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("expressions participate in codegen (no fallback)") {
    // a local Seq would constant-fold via ConvertToLocalRelation; use a
    // real parquet scan so the projection actually plans
    HashExprs.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("minhash_sig(text)"), expr("simhash64(text)"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(500))
  }
}
