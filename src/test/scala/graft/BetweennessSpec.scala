package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Betweenness

/** Brandes sampled betweenness on hand-computable planted graphs
  * (delta in 1e-6 units; U = 1000000). */
class BetweennessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val U = 1000000L

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxHops: Int = 4): Map[Long, Long] =
    Betweenness.sampled(
      edges.toDF("src", "dst"),
      sources.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph, one source: dependencies telescope " +
    "(middle nodes carry all downstream traffic)") {
    val bt = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L))
    assert(bt === Map(2L -> 2 * U, 3L -> U, 4L -> 0L),
      "delta(3)=U from 4; delta(2)=U+delta(3); source excluded")
  }

  test("diamond: two equal shortest paths split the dependency " +
    "via the exact integer division") {
    val bt = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L))
    // sigma(4) = 2; each middle node carries sigma_v/sigma_w = 1/2
    assert(bt === Map(2L -> U / 2, 3L -> U / 2, 4L -> 0L))
  }

  test("two sources accumulate; sources appear as plain nodes in " +
    "each other's sweeps") {
    val bt = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L, 4L))
    assert(bt === Map(1L -> 0L, 2L -> 3 * U, 3L -> 3 * U, 4L -> 0L))
  }

  test("hop cap truncates the sweep identically to a smaller graph") {
    val bt = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L),
      maxHops = 2)
    assert(bt === Map(2L -> U, 3L -> 0L),
      "node 4 is beyond the cap; node 3 becomes the (zero-delta) leaf")
  }

  test("sources outside the graph are dropped, not seeded") {
    val bt = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 99L))
    assert(bt === Map(2L -> U, 3L -> 0L))
  }
}
