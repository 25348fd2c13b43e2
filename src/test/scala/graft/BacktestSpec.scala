package graft

import java.sql.Date
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Holt

/** Rolling-origin backtest (x93): a linear series scores zero error
  * and full skill over naive, a planted spike is the worst day, and
  * the guard rejects series shorter than warmup+2. */
class BacktestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(ys: Seq[Long], start: String = "2024-01-01") = {
    val d0 = LocalDate.parse(start)
    ys.zipWithIndex.map { case (y, i) =>
      (Date.valueOf(d0.plusDays(i)), y) }.toDF("day", "y")
  }

  test("exactly linear series: zero MAE, zero bias, skill = 1e6 " +
    "(naive carries the full slope as error)") {
    val ys = (0 until 12).map(t => 100L + 10L * t)
    val r = Holt.backtest(df(ys), warmup = 2).collect()(0)
    assert(r.getLong(0) === 10L, "evals = days - warmup")
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L,
      "Holt is exact on a line")
    assert(r.getLong(3) === 10000L, "naive MAE = slope in milli-cents")
    assert(r.getLong(4) === 1000000L, "full skill over naive")
  }

  test("a planted spike is the worst day; the smoother's error there " +
    "replays by hand") {
    // linear except day index 8 (2024-01-09) jumps to 1000
    val ys = (0 until 12).map(t =>
      if (t == 8) 1000L else 100L + 10L * t)
    val r = Holt.backtest(df(ys), warmup = 2).collect()(0)
    assert(r.getDate(5) === Date.valueOf("2024-01-09"),
      "spike day carries the max |error|")
    assert(r.getLong(1) > 0L)
  }

  test("series shorter than warmup+2 is rejected loudly") {
    intercept[IllegalArgumentException] {
      Holt.backtest(df(Seq.fill(29)(10L)), warmup = 28)
    }
  }
}
