package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Survival

/** Kaplan–Meier on a hand-computed fixture: censoring removes from
  * the risk set without counting as an event, a censored unit at an
  * event time is still at risk for that event, and risk-set
  * extinction pins survival to exactly 0 instead of ln(0). */
class SurvivalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("textbook fixture: S steps only at event times, censoring " +
    "shrinks the risk set silently, extinction hits exactly 0") {
    // (duration, observed): events at 1,2,3,5; censored at 2 and 4
    val per = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1), (4L, 0), (5L, 1))
      .toDF("t", "observed")
    val out = Survival.kaplanMeier(per).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.map(x => (x._1, x._2, x._3, x._4)) === Seq(
      (1L, 6L, 1L, 0L), (2L, 5L, 1L, 1L), (3L, 3L, 1L, 0L),
      (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L)),
      "at-risk counts: censored-at-2 is still at risk AT t=2")
    val s = out.map(_._5)
    assert(math.abs(s(0) - 5.0 / 6) < 1e-5)
    assert(math.abs(s(1) - 5.0 / 6 * 4 / 5) < 1e-5)
    assert(math.abs(s(2) - 5.0 / 6 * 4 / 5 * 2 / 3) < 1e-5)
    assert(s(3) === s(2), "a censor-only time never moves the curve")
    assert(s(4) === 0.0, "the last at-risk unit's event extinguishes " +
      "survival to exactly zero, not ln(0)")
  }

  test("no censoring degenerates to the empirical survivor function") {
    val per = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1))
      .toDF("t", "observed")
    val s = Survival.kaplanMeier(per).collect().map(_.getDouble(4))
    assert(math.abs(s(0) - 0.75) < 1e-5)
    assert(math.abs(s(1) - 0.5) < 1e-5)
    assert(math.abs(s(2) - 0.25) < 1e-5)
    assert(s(3) === 0.0)
  }

  test("all-censored cohort never drops below 1") {
    val per = Seq((3L, 0), (7L, 0)).toDF("t", "observed")
    val s = Survival.kaplanMeier(per).collect().map(_.getDouble(4))
    assert(s.forall(_ === 1.0))
  }
}
