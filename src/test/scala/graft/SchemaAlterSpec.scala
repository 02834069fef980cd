package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.store.SchemaAlter

/** Live schema alteration (Datomic "Schema Change"): the card-one→many
  * flip's two-phase resolution, the :db/unique addition gate, and
  * ident renames — q82's machinery, checked against an in-memory
  * reference model over random logs. */
class SchemaAlterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, String, String, Long, Boolean)]) =
    rows.toDF("e", "a", "v", "tx", "op")
      .withColumn("v_long", lit(null).cast("long"))
      .withColumn("is_ref", lit(false))

  test("card flip: accumulate after, last-wins before, superseded retract no-ops") {
    val log = Seq(
      ("e1", "st", "A", 1L, true),   // superseded at tx2 (card-one)
      ("e1", "st", "B", 2L, true),   // survivor at the flip
      ("e1", "st", "C", 3L, true),   // accumulates (flip at tx2)
      ("e1", "st", "A", 3L, false),  // retracts a SUPERSEDED value → no-op
      ("e2", "st", "A", 1L, true),
      ("e2", "st", "C", 3L, true),
      ("e2", "st", "A", 4L, false))  // real set-remove of the survivor
    val got = SchemaAlter.resolveCardFlip(df(log), "st", 2L, Seq.empty)
      .select("e", "v").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("e1", "B"), ("e1", "C"), ("e2", "C")))
  }

  test("card flip equals the two-phase reference model over random logs") {
    val genDatom = for {
      e <- Gen.oneOf("e1", "e2")
      v <- Gen.oneOf("v1", "v2", "v3")
      tx <- Gen.choose(1L, 6L)
      op <- Gen.oneOf(true, false)
    } yield (e, "st", v, tx, op)
    val genLog = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, genDatom))
    val alterTx = 3L
    val cases = (1 to 40).flatMap(i => genLog.apply(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { rows =>
      val got = SchemaAlter.resolveCardFlip(df(rows), "st", alterTx, Seq.empty)
        .select("e", "v").collect().map(r => (r.getString(0), r.getString(1))).toSet
      // reference: card-one resolve of the prefix picks, per e, the
      // visible value with max last-assert tx (same-tx assert beats
      // retract, value ties break high); the suffix then runs set
      // semantics seeded with the survivor as an assert at alterTx
      val expected = rows.map(_._1).distinct.flatMap { e =>
        val pre = rows.filter(r => r._1 == e && r._4 <= alterTx)
        val visible = pre.groupBy(_._3).flatMap { case (v, ds) =>
          val maxTx = ds.map(_._4).max
          if (ds.filter(_._4 == maxTx).map(_._5).max) // assert wins the tie
            Some((v, ds.filter(_._5).map(_._4).max))
          else None
        }
        val survivor = visible.toSeq.sortBy { case (v, lastAssert) => (lastAssert, v) }
          .lastOption.map(_._1)
        val events = survivor.map(v => (v, alterTx, true)).toSeq ++
          rows.filter(r => r._1 == e && r._4 > alterTx).map(r => (r._3, r._4, r._5))
        events.groupBy(_._1).toSeq.flatMap { case (v, es) =>
          val maxTx = es.map(_._2).max
          if (es.filter(_._2 == maxTx).map(_._3).max) Some((e, v)) else None
        }
      }.toSet
      assert(got == expected, s"log=$rows")
    }
  }

  test("unique gate: distinct values pass, collisions are reported") {
    val state = df(Seq(
      ("e1", "code", "c1", 1L, true), ("e2", "code", "c2", 1L, true),
      ("e1", "st", "A", 1L, true), ("e2", "st", "A", 1L, true),
      ("e3", "st", "B", 1L, true), ("e4", "st", "B", 1L, true),
      ("e5", "st", "C", 1L, true)))
    assert(SchemaAlter.uniqueConflicts(state, "code").count() == 0L)
    val bad = SchemaAlter.uniqueConflicts(state, "st")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bad == Set(("A", 2L), ("B", 2L)))
  }

  test("ident rename: view rewrite + old ident resolves through the alias") {
    val state = df(Seq(("e1", "order/status", "S1", 1L, true),
      ("e1", "other", "x", 1L, true)))
    val renamed = SchemaAlter.renameAttr(state, "order/status", "order/state")
    assert(renamed.filter(col("a") === "order/state").count() == 1L)
    assert(renamed.filter(col("a") === "order/status").count() == 0L)
    assert(renamed.filter(col("a") === "other").count() == 1L)
    val aliases = Map("order/status" -> "order/state")
    assert(SchemaAlter.canonical(aliases, "order/status") == "order/state")
    assert(SchemaAlter.canonical(aliases, "order/state") == "order/state")
  }
}
