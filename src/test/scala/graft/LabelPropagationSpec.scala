package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.LabelPropagation

/** LPA on two K4 cliques bridged by one edge: communities = cliques. */
class LabelPropagationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clique(ids: Seq[Long]) =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  private def edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
    clique(Seq(11L, 12L, 13L, 14L)) ++ Seq((4L, 11L)))
    .toDF("src", "dst")

  private def communities(rounds: Int): Map[Long, Long] =
    LabelPropagation.run(edges, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two bridged cliques settle into two communities, bridge does " +
    "not leak") {
    val c = communities(5)
    assert(Set(1L, 2L, 3L, 4L).map(c) === Set(1L))
    assert(Set(11L, 12L, 13L, 14L).map(c) === Set(11L))
  }

  test("fixpoint: one more round changes nothing") {
    assert(communities(5) === communities(6))
  }

  test("self-vote damping: a single edge converges instead of " +
    "two-color oscillating") {
    val pair = Seq((7L, 8L)).toDF("src", "dst")
    val c = LabelPropagation.run(pair, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(7L -> 7L, 8L -> 7L))
  }

  test("conductance: two bridged triangles score 1/7 each; an " +
    "isolated clique scores 0; counts are exact") {
    // triangles {1,2,3} and {4,5,6} joined by 3-4; clique {10,11,12}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)
    ).toDF("src", "dst")
    val out = LabelPropagation.conductance(edges).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // whatever labels LPA settles on, the SHAPE is pinned: two
    // 3-node communities with 3 internal + 1 cut (phi = 1/7), one
    // with 3 internal + 0 cut (phi = 0)
    val shapes = out.values.toSeq.sortBy(v => (v._4, v._1))
    assert(out.size === 3, s"expected 3 communities: $out")
    assert(shapes.count(_ == ((3L, 3L, 1L, 0.142857))) === 2,
      s"bridged triangles wrong: $shapes")
    assert(shapes.count(_ == ((3L, 3L, 0L, 0.0))) === 1,
      s"isolated clique wrong: $shapes")
  }
}
