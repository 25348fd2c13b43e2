package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.LinkPrediction

class LinkPredictionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lnInv2 = BigDecimal(1.0 / math.log(2.0))
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("open wedge scores its endpoints; closed triangle scores nothing") {
    // wedge a(1)-z(2)-b(3) plus a closed triangle 4-5-6
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val got = LinkPrediction.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 3L, 1L, lnInv2)))
  }

  test("two shared neighbors double the count and sum both terms") {
    // 4-cycle 1-2-4-3-1: the two diagonals (1,4) and (2,3) each share
    // two degree-2 neighbors; both score 2/ln(2), ranked by (a, b)
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = LinkPrediction.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq ===
      Seq((1L, 4L, 2L, 2 * lnInv2), (2L, 3L, 2L, 2 * lnInv2)))
  }

  test("hub centers above maxDegree are excluded from scoring") {
    // star: center 100 connected to 1..5 — every leaf pair is a 2-hop
    // candidate through the hub; cap below 5 kills them all
    val star = (1L to 5L).map(i => (100L, i)).toDF("src", "dst")
    assert(LinkPrediction.adamicAdar(star, maxDegree = 4).isEmpty)
    assert(LinkPrediction.adamicAdar(star, maxDegree = 5).count() === 10L)
  }

  test("duplicate and reversed edges do not inflate degrees or counts") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val got = LinkPrediction.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 3L, 1L, lnInv2)))
  }
}
