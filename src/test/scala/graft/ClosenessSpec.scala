package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Closeness

/** Multi-source closeness on hand graphs: exact distance sums, cap
  * semantics, and unreachable-source absence. */
class ClosenessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val path5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    .toDF("src", "dst")

  test("path graph: the center is measurably closer than the end") {
    val out = Closeness.multiSource(path5, Seq(1L, 3L).toDF("node"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 10L, 0.4)))
    assert(out(3L) === ((4L, 6L, 0.666667)))
  }

  test("a source disconnected from everything is absent rather than " +
    "reported with zero distance") {
    val out = Closeness.multiSource(path5, Seq(1L, 99L).toDF("node"))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }

  test("the hop cap truncates the reachable set identically to the " +
    "capped recursion") {
    val path8 = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Closeness.multiSource(path8, Seq(1L).toDF("node"),
      maxHops = 3).collect().head
    assert(out.getLong(1) === 3L && out.getLong(2) === 6L)
  }
}
