package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PageRank

/** PageRank on planted graphs with hand-checkable structure. */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("symmetric 2-cycle: equal ranks; mass bounded by 1") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") === r("b"))
    // integer truncation only ever loses mass — never creates it
    assert(r.values.sum <= 1000000000L)
    assert(r.values.sum > 900000000L)
  }

  test("star graph: the hub out-ranks the spokes") {
    val edges = Seq(
      ("hub", "s1"), ("hub", "s2"), ("hub", "s3"),
      ("s1", "hub"), ("s2", "hub"), ("s3", "hub")
    ).toDF("src", "dst")
    val r = PageRank.run(edges, iters = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("hub") > r("s1"))
    assert(r("s1") === r("s2"))
    assert(r("s2") === r("s3"))
  }

  test("personalized: S = all nodes degenerates to exactly global " +
    "PageRank; mass never reaches a component disconnected from S; " +
    "seeds carry the teleport base") {
    // two disjoint symmetric 2-cycles; seed only the a-b component
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val p = PageRank.personalized(edges, seeds, iters = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(p("c") === 0L && p("d") === 0L,
      "teleport must not resurrect unreachable components")
    val base = 1000000000L * 15L / 100L // |S| = 1
    assert(p("a") >= base, "a seed always keeps its teleport mass")
    assert(p("b") > 0L, "mass walks to the seed's neighbor")
    // degenerate case: seeding EVERY node is global PageRank exactly
    val all = Seq("a", "b", "c", "d").toDF("node")
    val glob = PageRank.run(edges, iters = 7).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val pall = PageRank.personalized(edges, all, iters = 7).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(pall === glob)
  }

  test("broadcast guard: the broadcastRanks hint is refused when the " +
    "node count exceeds autoBroadcastJoinThreshold, and the fallback " +
    "shuffle join produces bit-identical ranks") {
    // guard decision: threshold-aware, refuses when disabled
    assert(PageRank.broadcastFits(spark, 100L))
    assert(!PageRank.broadcastFits(spark, Long.MaxValue / 64))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
      assert(!PageRank.broadcastFits(spark, 100L),
        "a 100-node rate frame must not broadcast under a 1-byte budget")
      // hash parity: same hint, guard now forces the shuffle join —
      // integer fixed-point makes the comparison exact, not approximate
      val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
        .toDF("src", "dst")
      val guarded = PageRank.run(edges, iters = 6, broadcastRanks = true)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val hinted = PageRank.run(edges, iters = 6, broadcastRanks = true)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(guarded === hinted)
      val seeds = Seq("a").toDF("node")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
      val pGuarded = PageRank
        .personalized(edges, seeds, iters = 6, broadcastRanks = true)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val pHinted = PageRank
        .personalized(edges, seeds, iters = 6, broadcastRanks = true)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(pGuarded === pHinted)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("sink node collects rank from its pointers") {
    // chain a -> b -> c: c inherits the most flowed mass after a few
    // rounds; a (no in-edges) sits at the teleport base
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = PageRank.run(edges, iters = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val base = (1000000000L / 3) * 15L / 100L
    assert(out("a") === base)
    assert(out("b") > out("a"))
    assert(out("c") > out("a"))
  }
}
