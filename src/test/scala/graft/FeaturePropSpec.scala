package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.FeatureProp

/** Two-hop neighbor feature means on hand graphs. */
class FeaturePropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs.map { case (a, b) => (a, b) } ++
      pairs.map { case (a, b) => (b, a) }).toDF("src", "dst")

  test("path graph 1-2-3: hop-1 and hop-2 means match hand values, " +
    "negative features included") {
    val edges = undirected(1L -> 2L, 2L -> 3L)
    val feats = Seq((1L, 100L), (2L, -250L), (3L, 400L))
      .toDF("node", "f")
    val out = FeatureProp.twoHopMeans(edges, feats)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      // node 1: nbr {2} → h1 = −250; nbr h1(2)=250 → h2 = 250
      (1L, 100L, 1L, -250.0, 250.0),
      // node 2: nbrs {1,3} → h1 = (100+400)/2 = 250; h2 = (−250−250)/2
      (2L, -250L, 2L, 250.0, -250.0),
      (3L, 400L, 1L, -250.0, 250.0)))
  }

  test("non-divisible means truncate toward zero in micro-units") {
    // star: center 2 with leaves 1,3,4; Σf = 500 over deg 3
    val edges = undirected(1L -> 2L, 2L -> 3L, 2L -> 4L)
    val feats = Seq((1L, 100L), (2L, 7L), (3L, 400L), (4L, 0L))
      .toDF("node", "f")
    val out = FeatureProp.twoHopMeans(edges, feats)
      .orderBy("node").collect()
    val center = out.find(_.getLong(0) == 2L).get
    // (500·1e6) div 3 = 166666666 units → 166.666666
    assert(center.getDouble(3) === 166.666666)
    // leaves see only the center: h1 = 7.0; center's h2 averages the
    // three leaf h1 values, each exactly 7.0
    assert(center.getDouble(4) === 7.0)
    val leaf = out.find(_.getLong(0) == 1L).get
    assert(leaf.getDouble(3) === 7.0)
    assert(leaf.getDouble(4) === 166.666666)
  }
}
