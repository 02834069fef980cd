package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SpaceSaving

/** SpaceSaving's published guarantees, checked against exact counts
  * over generated skewed streams — per summary and for the merged
  * Σ-bounds d62 gates on. */
class SpaceSavingSpec extends AnyFunSuite {

  private def streams: Seq[Seq[String]] = {
    // skewed streams: a few heavy items over a long tail
    val genItem = Gen.frequency(
      8 -> Gen.oneOf("alpha", "beta", "gamma"),
      3 -> Gen.choose(1, 30).map("mid" + _),
      2 -> Gen.choose(1, 500).map("tail" + _))
    (1 to 10).map { i =>
      (1 to 3000).flatMap(j =>
        genItem.apply(Gen.Parameters.default, Seed(i * 100000L + j)))
    }
  }

  test("per-summary: overestimate, bounded error, floor bounds absent items") {
    streams.foreach { stream =>
      val exact = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val (entries, floor) = SpaceSaving.summarize(stream.iterator, 64)
      assert(entries.size <= 64)
      entries.foreach { case (item, est, err) =>
        val t = exact(item)
        assert(est >= t, s"$item est=$est true=$t")
        assert(est - err <= t, s"$item est-err=${est - err} true=$t")
      }
      val present = entries.map(_._1).toSet
      exact.filterNot { case (k, _) => present(k) }.foreach { case (item, t) =>
        assert(t <= floor, s"absent $item true=$t floor=$floor")
      }
    }
  }

  test("merged Σ-bounds bracket every true count across partitions") {
    streams.take(4).foreach { stream =>
      val parts = stream.grouped(800).toSeq
      val sums = parts.map(p => SpaceSaving.summarize(p.iterator, 32))
      val exact = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      exact.foreach { case (item, t) =>
        val lb = sums.map { case (es, _) =>
          es.find(_._1 == item).map { case (_, e, r) => e - r }.getOrElse(0L) }.sum
        val ub = sums.map { case (es, floor) =>
          es.find(_._1 == item).map(_._2).getOrElse(floor) }.sum
        assert(lb <= t && t <= ub, s"$item lb=$lb true=$t ub=$ub")
      }
    }
  }

  test("d64: CMS contract booleans are uniformly TRUE, not just cross-engine-equal") {
    // the oracle gate proves both engines compute identical lb_ok /
    // bound_ok values; this pins that the sketch actually SATISFIES
    // the contract (est >= true, overestimate <= 2N/w) on real data
    val spark = TestSpark.spark
    val rows = graft.queries.Llm
      .d64_cms_heavy_users(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("lb_ok"), r.toString)
      assert(r.getAs[Boolean]("bound_ok"), r.toString)
      assert(r.getAs[Long]("est") >= r.getAs[Long]("true_cnt"))
    }
  }
}
