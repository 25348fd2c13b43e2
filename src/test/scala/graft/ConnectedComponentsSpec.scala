package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ConnectedComponents

/** Min-label propagation on planted graphs, including a long chain whose
  * diameter forces several propagation rounds. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("two separate cliques resolve to their min ids") {
    val got = components(Seq(
      (5L, 3L), (3L, 9L), (9L, 5L), // triangle {3,5,9} → 3
      (20L, 30L)))                  // pair {20,30} → 20
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 30L -> 20L))
  }

  test("a 12-node chain converges past the per-round horizon") {
    // chain 100-101-…-111 with min at the FAR end: label 100 must walk
    // the whole diameter, exercising the convergence loop (not 1 round)
    val chain = (100L until 111L).map(i => (i + 1, i))
    val got = components(chain)
    assert(got.keySet === (100L to 111L).toSet)
    assert(got.values.toSet === Set(100L))
  }

  test("duplicate and reversed edges don't perturb the result") {
    val got = components(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("an empty edge list yields an empty labeling, not an NPE") {
    assert(components(Seq.empty[(Long, Long)]) === Map.empty)
  }
}
