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

  test("hop distribution from the path end: one pair per hop, " +
    "effective diameter at the 90th-percentile hop") {
    // from node 1 on the 5-path: exactly one node at each hop 1..4
    val out = Closeness.hopDistribution(path5, Seq(1L).toDF("node"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1, 1L, 1L, 0.25, false),
      (2, 1L, 2L, 0.5, false),
      (3, 1L, 3L, 0.75, false),
      (4, 1L, 4L, 1.0, true)))
  }

  test("a panel wider than one 64-bit mask chunks transparently: " +
    "70 sources on a star all report identical exact stats") {
    // star: center 0 — leaves 1..100. Every leaf-source reaches the
    // center at hop 1 and the 99 other leaves at hop 2.
    val star = (1L to 100L).map(i => (0L, i)).toDF("src", "dst")
    val out = Closeness.multiSource(star,
      (1L to 70L).toDF("node")).collect()
    assert(out.length === 70)
    out.foreach { r =>
      assert(r.getLong(1) === 100L, s"n_reached for ${r.getLong(0)}")
      assert(r.getLong(2) === (1L + 99L * 2L))
    }
    // and the pooled hop distribution counts every (source, node) pair
    // exactly once across both chunks: 70 at hop 1, 70*99 at hop 2
    val hd = Closeness.hopDistribution(star, (1L to 70L).toDF("node"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(hd.toSeq === Seq((1, 70L), (2, 70L * 99L)))
  }

  test("hop distribution pools pairs across sources and flags the " +
    "first hop covering 90% of reachable pairs") {
    // sources 1 and 3 on the 5-path: 8 reachable pairs total;
    // hop1: (1->2),(3->2),(3->4) = 3; hop2: (1->3),(3->1),(3->5) = 3;
    // hop3: (1->4) = 1; hop4: (1->5) = 1. cum: 3,6,7,8 -> p90 at hop 4
    val out = Closeness.hopDistribution(path5, Seq(1L, 3L).toDF("node"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(4)))
    assert(out.toSeq === Seq((1, 3L, false), (2, 3L, false),
      (3, 1L, false), (4, 1L, true)))
  }
}
