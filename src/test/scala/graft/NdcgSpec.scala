package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.RankingMetrics

/** NDCG@k (ml27): hand-computed integer DCG/IDCG on planted rankings
  * — perfect order scores exactly 10⁶, an interleaved order scores
  * the exact literal-weight ratio, and a query with no relevant
  * corpus has NULL (not 0, not 10⁶). */
class NdcgSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // the metric's literal weights, replayed independently
  private def w(r: Int): Long =
    math.round(1000000.0 / (math.log(r + 1) / math.log(2.0)))

  test("perfect, interleaved and no-relevant rankings") {
    import spark.implicits._
    val labels = Seq(
      100L -> "A", 200L -> "B", 300L -> "C",
      1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B", 5L -> "B")
      .toDF("vec_id", "label")
    val ranked = Seq(
      // q100 (A, n_rel_total=2): relevant at ranks 1 and 3
      (100L, 1, 1L), (100L, 2, 3L), (100L, 3, 2L),
      (100L, 4, 4L), (100L, 5, 5L),
      // q200 (B, n_rel_total=3): all three relevant on top — perfect
      (200L, 1, 3L), (200L, 2, 4L), (200L, 3, 5L),
      (200L, 4, 1L), (200L, 5, 2L),
      // q300 (C): nothing relevant exists
      (300L, 1, 1L), (300L, 2, 2L), (300L, 3, 3L),
      (300L, 4, 4L), (300L, 5, 5L))
      .toDF("query_id", "rank", "corpus_id")
    val out = RankingMetrics.ndcgAtK(ranked, labels, k = 5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(100L, 200L, 300L))
    val q100 = out(0)
    assert(q100.getLong(1) === 2L && q100.getLong(2) === 2L)
    assert(q100.getLong(3) === w(1) + w(3), "DCG = w1 + w3 exactly")
    assert(q100.getLong(4) === w(1) + w(2), "IDCG = cum weights(2)")
    assert(q100.getLong(5) ===
      (w(1) + w(3)) * 1000000L / (w(1) + w(2)))
    val q200 = out(1)
    assert(q200.getLong(3) === q200.getLong(4) &&
      q200.getLong(5) === 1000000L, "perfect ranking scores exactly 1")
    val q300 = out(2)
    assert(q300.getLong(2) === 0L && q300.isNullAt(5),
      "no relevant corpus ⇒ NULL, not a number")
  }

  test("ranks beyond k are ignored, not summed into n_rel_topk") {
    import spark.implicits._
    val labels = Seq(100L -> "A", 1L -> "A", 2L -> "A", 3L -> "A")
      .toDF("vec_id", "label")
    // a 4-deep list scored at k=2: the two tail hits must count
    // neither toward DCG (rank-capped by construction) nor toward
    // n_rel_topk (the regression this test pins)
    val ranked = Seq(
      (100L, 1, 1L), (100L, 2, 2L), (100L, 3, 3L), (100L, 4, 3L))
      .toDF("query_id", "rank", "corpus_id")
    val out = RankingMetrics.ndcgAtK(ranked, labels, k = 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 2L,
      "n_rel_topk counts only ranks <= k")
    assert(out(0).getLong(3) === w(1) + w(2))
    assert(out(0).getLong(5) === 1000000L)
  }
}
