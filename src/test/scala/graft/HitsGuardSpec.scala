package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-15 scale-adaptive join guard in Hits.run: the
  * broadcast and shuffle-join branches must produce bit-identical
  * scores (the guard may only change the physical join strategy,
  * never a value), and the default path must equal both. */
class HitsGuardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("g9 guard: broadcast and shuffle branches are bit-identical") {
    import spark.implicits._
    // a small directed graph with hubs, authorities, ties and a cycle
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L), (4L, 13L), (5L, 13L), (10L, 1L), (13L, 4L),
      (6L, 14L), (7L, 14L), (6L, 15L)).toDF("src", "dst")
    def rows(bcastEdgeRows: Long) =
      graft.graph.Hits.run(edges, 3, bcastEdgeRows)
        .orderBy("role", "node")
        .collect().map(_.toString).toSeq
    val always = rows(0L)              // edge count >= 0: broadcast
    val never = rows(Long.MaxValue)    // never reaches the threshold
    val default = graft.graph.Hits.run(edges, 3)
      .orderBy("role", "node").collect().map(_.toString).toSeq
    assert(always.nonEmpty)
    assert(always == never)
    assert(default == always)
  }
}
