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
}
