package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ShortestPaths

class ShortestPathsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cheap 2-edge detour beats an expensive direct edge") {
    val edges = Seq((1L, 3L, 5L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val got = ShortestPaths.sssp(edges, source = 1L, maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("round cap bounds path length in edges, not weight") {
    // chain 1-2-3-4; 2 rounds reach at most 2 edges from the source
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = ShortestPaths.sssp(chain, source = 1L, maxRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("parallel edges collapse to min weight; other components absent") {
    val edges = Seq((1L, 2L, 7L), (2L, 1L, 2L), (10L, 11L, 1L))
      .toDF("src", "dst", "w")
    val got = ShortestPaths.sssp(edges, source = 1L, maxRounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L))
  }

  test("unit weights: SSSP distances equal BFS hop distances on a " +
    "pseudo-random graph") {
    // deterministic scramble: edges (i, (i*7+3) mod 40) for i < 40
    val raw = (0L until 40L).map(i => (i, (i * 7 + 3) % 40, 1L))
      .filter { case (a, b, _) => a != b }
    val sssp = graft.graph.ShortestPaths
      .sssp(raw.toDF("src", "dst", "w"), source = 0L, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = graft.graph.Bfs
      .bfsHops(raw.map { case (a, b, _) => (a, b) }.toDF("src", "dst"),
        source = 0L, maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(sssp === bfs)
  }

  test("later cheaper path through a ring replaces an earlier greedy one") {
    // 1-2 (w10); 1-3-4-2 (w 1+1+1): relaxed over more rounds, must win
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L),
      (4L, 2L, 1L)).toDF("src", "dst", "w")
    val got = ShortestPaths.sssp(edges, source = 1L, maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 3L -> 1L, 4L -> 2L, 2L -> 3L))
  }
}
