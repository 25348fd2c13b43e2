package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Bfs

class BfsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hop cap truncates the chain; other components never appear") {
    val edges = ((1L until 9L).map(i => (i, i + 1)) ++ Seq((20L, 21L)))
      .toDF("src", "dst")
    val got = Bfs.bfsHops(edges, source = 1L, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("cycle: min distance wins, every node reached once") {
    // 1-2-3-4-1 ring: node 3 is 2 hops either way
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Bfs.bfsHops(ring, source = 1L, maxHops = 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }
}
