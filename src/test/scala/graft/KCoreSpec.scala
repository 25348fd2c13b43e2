package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.KCore

/** k-core peeling on a hand-built graph: K4 {1,2,3,4} + chain 4-5-6 +
  * triangle {7,8,9} bridged to the K4 by edge 4-7. */
class KCoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
    (4L, 5L), (5L, 6L),                                         // chain
    (7L, 8L), (7L, 9L), (8L, 9L),                               // triangle
    (4L, 7L)                                                    // bridge
  ).toDF("src", "dst")

  private def cores(k: Int): Map[Long, Long] =
    KCore.run(edges, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core: chain peels off (cascading), K4 + triangle + bridge " +
    "survive") {
    val c = cores(2)
    assert(c.keySet === Set(1L, 2L, 3L, 4L, 7L, 8L, 9L))
    assert(c(4L) === 4L) // 1,2,3 + bridge to 7
    assert(c(7L) === 3L)
    assert(c(8L) === 2L && c(9L) === 2L)
  }

  test("3-core: triangle peels, then the orphaned bridge; K4 remains") {
    val c = cores(3)
    assert(c.keySet === Set(1L, 2L, 3L, 4L))
    assert(c.values.toSet === Set(3L))
  }

  test("4-core: empty — the whole graph peels away") {
    assert(KCore.run(edges, 4).isEmpty)
  }

  test("duplicate and reversed edges do not inflate degrees") {
    val noisy = edges.unionAll(
      Seq((2L, 1L), (1L, 2L), (4L, 1L)).toDF("src", "dst"))
    assert(cores(3) === KCore.run(noisy, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }
}
