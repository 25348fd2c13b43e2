package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.QualityFilter

/** Model-based quality filter on planted labels: the hashed log-odds +
  * IRLS calibration must rank every junk doc below every clean one. */
class QualityFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cleanTexts = Seq(
    "the quick brown fox jumps over the lazy dog near the garden wall",
    "a fast query engine scans columnar data with vectorized filters",
    "brown dogs and quick foxes share the garden in the afternoon sun",
    "the engine pushes filters down to the columnar scan for speed",
    "lazy afternoon sun warms the garden wall where the dog sleeps"
  )

  private def labeled = {
    val clean = cleanTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 1.0) }
    // junk: same length, disjoint token distribution (prefixed tokens)
    val junk = cleanTexts.zipWithIndex
      .map { case (t, i) =>
        (100L + i, t.split(" ").map("zz" + _).mkString(" "), 0.0) }
    (clean ++ junk).toDF("doc_id", "text", "y")
  }

  test("fitScore ranks every planted junk doc strictly below every " +
    "clean doc, in both the raw feature and the calibrated probability") {
    val out = QualityFilter.fitScore(labeled).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("x_micro"),
        r.getAs[Long]("p_micro")))
    assert(out.length === 10)
    val (clean, junk) = out.partition(_._1 < 100)
    assert(junk.map(_._2).max < clean.map(_._2).min,
      "raw mean log-odds must separate the classes")
    assert(junk.map(_._3).max < clean.map(_._3).min,
      "calibrated probability must preserve the separation")
    assert(out.forall(r => r._3 >= 0L && r._3 <= 1000000L))
  }

  test("the model is bucket-sized and bounded by the bucket count") {
    val model = QualityFilter.tokenLogOdds(labeled, buckets = 16)
    assert(model.count() <= 16)
    // clean-token buckets carry positive weight, junk-token negative
    val ws = model.select("w_micro").as[Long].collect()
    assert(ws.exists(_ > 0) && ws.exists(_ < 0))
  }

  test("scoring an unlabeled doc against a frozen model needs no " +
    "labels and is deterministic") {
    val model = QualityFilter.tokenLogOdds(labeled)
    val fresh = Seq((7L, "the quick dog jumps over the garden wall"))
      .toDF("doc_id", "text")
    val a = QualityFilter.score(fresh, model).collect().head.getLong(1)
    val b = QualityFilter.score(fresh, model).collect().head.getLong(1)
    assert(a === b)
    assert(a > 0L, "an all-clean-vocabulary doc must score positive")
  }
}
