package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.KTruss

class KTrussSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] =
    KTruss.run(edges.toDF("src", "dst"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-truss keeps the triangle, drops the pendant tail") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(truss(g, 3) === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("4-truss peel cascades: two triangles sharing an edge all " +
    "collapse") {
    // shared edge (2,3) has support 2, the others 1: round 1 drops the
    // support-1 edges, which strips (2,3)'s triangles -> round 2 empty
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(truss(g, 4) === Set.empty)
  }

  test("4-clique survives a 4-truss intact (every edge support 2)") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(truss(g, 4) === g.toSet)
  }

  test("duplicate / reversed / self-loop edges collapse before the peel") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(truss(g, 3) === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }
}
