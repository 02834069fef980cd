package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConnectedComponents

/** Min-label propagation: correct component labels on chains, cliques
  * and singleton-free graphs; convergence bound respected. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two components and a long chain resolve to min-id labels") {
    // chain 1-2-3-4-5 (diameter 4) and triangle 10-11-12
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val got = ConnectedComponents.components(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), got.toString)
  }

  test("edge direction does not matter; max-id root still resolves") {
    val edges = Seq((9L, 3L), (3L, 7L)).toDF("a", "b") // given "backwards"
    val got = ConnectedComponents.components(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 7L -> 3L, 9L -> 3L), got.toString)
  }

  test("iteration cap surfaces as a clear error") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      ConnectedComponents.components(edges, "a", "b", maxIters = 1).collect())
    assert(e.getMessage.contains("converge"))
  }
}
