package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Triangles

/** Exact triangle counting on planted graphs. */
class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Triangles.count(edges.toDF("src", "dst")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("K4 has 4 triangles; a chain has none") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(count(k4) === (4L, 6L, 4L))
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L))) === (4L, 3L, 0L))
  }

  test("duplicates, reversed direction, and self-loops collapse") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L))
    assert(count(tri) === (3L, 3L, 1L))
  }

  test("two triangles sharing an edge count separately") {
    // 1-2-3 and 2-3-4 share edge (2,3)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(count(g) === (4L, 5L, 2L))
  }

  test("hub star plus one closing edge: exactly one triangle " +
    "(orientation bounds hub wedges)") {
    // hub 0 connected to 1..10, plus edge (1,2)
    val g = (1L to 10L).map(i => (0L, i)) :+ (1L, 2L)
    assert(count(g) === (11L, 11L, 1L))
  }

  test("per-node clustering: triangle corner 1, bridge 1/3, pendant 0") {
    // triangle 1-2-3 plus pendant 4 attached to 1:
    // cc(2) = cc(3) = 1 (deg 2, 1 triangle); cc(1) = 2·1/(3·2) = 1/3;
    // cc(4) = 0 (degree 1)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("src", "dst")
    val got = Triangles.perNodeClustering(g).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 2.0 * 1 / (3.0 * 2.0))),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0)),
      4L -> ((1L, 0L, 0.0))))
  }
}
