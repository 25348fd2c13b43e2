package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Holt

/** Holt linear-trend smoothing: hand-computed integer recursions. */
class HoltSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Long)]) =
    rows.map { case (d, y) => (Date.valueOf(d), y) }.toDF("day", "y")

  test("an exactly linear series is recovered exactly: level tracks " +
    "the line, trend equals the slope, forecasts extend it") {
    // y = 10, 12, 14 cents; slope 2 → units recursion stays exact
    val out = Holt.forecast(df(Seq(
      "2024-01-01" -> 10L, "2024-01-02" -> 12L, "2024-01-03" -> 14L)),
      horizon = 3)
      .orderBy("h").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1, 16000L, 16.0), (2, 18000L, 18.0), (3, 20000L, 20.0)))
  }

  test("calendar gaps are filled with zero revenue — hand-computed " +
    "state walk") {
    // days 1,2,4 → missing day 3 contributes y=0
    // l1=10000 b1=2000; t2: l=12000 b=2000; t3(y=0): l=11200 b=1720;
    // t4(y=14): l=13136 b=1741 → h1 = 14877
    val out = Holt.forecast(df(Seq(
      "2024-01-01" -> 10L, "2024-01-02" -> 12L, "2024-01-04" -> 14L)),
      horizon = 1).collect()
    assert(out.head.getLong(1) === 14877L)
  }

  test("negative trends propagate (truncating div toward zero, both " +
    "engines)") {
    val out = Holt.forecast(df(Seq(
      "2024-01-01" -> 20L, "2024-01-02" -> 10L, "2024-01-03" -> 0L)),
      horizon = 1).collect()
    // l: 20000→10000→0; b stays -10000 → forecast -10000 units
    assert(out.head.getLong(1) === -10000L)
  }

  test("a single-day series is rejected loudly") {
    intercept[IllegalArgumentException] {
      Holt.forecast(df(Seq("2024-01-01" -> 10L)))
    }
  }
}
