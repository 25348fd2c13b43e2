package graft

import java.sql.Date
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Holt

/** Holt-Winters additive (x92): exact recovery of a pure
  * trend+weekly-season series, a full independent BigInt replay of
  * the integer recursion on an irregular series, and the init guard. */
class HoltWintersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(LocalDate, Long)]) =
    rows.map { case (d, y) => (Date.valueOf(d), y) }.toDF("day", "y")

  private def series(ys: Seq[Long], start: String = "2024-01-01") = {
    val d0 = LocalDate.parse(start)
    ys.zipWithIndex.map { case (y, i) => (d0.plusDays(i), y) }
  }

  test("pure trend + weekly season: the smoother is at a fixed point " +
    "and forecasts extend the exact pattern") {
    // y_t = 100·t + s[t%7] with Σs relative to the week-1 mean; the
    // init convention (L0 = week-1 mean, B0 = week-over-week mean
    // diff / 7 = 100, S_i = y_i − L0) is EXACT for this family, so
    // every update leaves the state unchanged and ŷ_{T+h} is the true
    // continuation — in exact milli-cents.
    val season = Seq(0L, 70L, -70L, 140L, -140L, 210L, -210L)
    val ys = (0 until 21).map(t => 1000L + 100L * t + season(t % 7))
    val out = Holt.holtWinters(df(series(ys)), horizon = 7)
      .orderBy("h").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val expect = (1 to 7).map { h =>
      val t = 20 + h
      (h, (1000L + 100L * t + season(t % 7)) * 1000L)
    }
    assert(out.toSeq === expect)
  }

  test("irregular series: full independent integer replay (init, " +
    "truncating updates, seasonal slot rotation, gap fill)") {
    // 16 days with a gap at day 13 (fills as 0) and uneven values —
    // replay the exact recursion including negative seasonal terms
    val base = Seq(10L, 25L, 7L, 40L, 3L, 18L, 30L,
      12L, 28L, 5L, 44L, 1L, 20L, 33L, 15L)
    val d0 = LocalDate.parse("2024-03-01")
    val rows = base.zipWithIndex.collect {
      case (y, i) if i != 12 => (d0.plusDays(i), y)
    } :+ (d0.plusDays(15), 9L)
    val ys = base.updated(12, 0L) :+ 9L // gap filled, appended day 16
    val out = Holt.holtWinters(df(rows), horizon = 3)
      .orderBy("h").collect().map(r => (r.getInt(0), r.getLong(1)))

    def tdiv(a: Long, b: Long) = if (a >= 0) a / b else -((-a) / b)
    val m1 = ys.take(7).map(_ * 1000L).sum / 7L
    var b = tdiv((ys.slice(7, 14).sum - ys.take(7).sum) * 1000L, 49L)
    var l = m1 + 3L * b
    val s = Array.tabulate(7)(i =>
      ys(i) * 1000L - m1 - (i - 3).toLong * b)
    (7 until ys.length).foreach { t =>
      val si = t % 7
      val lNew = tdiv(ys(t) * 1000L - s(si) + 4L * (l + b), 5L)
      b = tdiv((lNew - l) + 9L * b, 10L)
      s(si) = tdiv((ys(t) * 1000L - lNew) + 9L * s(si), 10L)
      l = lNew
    }
    val expect = (1 to 3).map(h =>
      (h, l + h * b + s((ys.length - 1 + h) % 7)))
    assert(out.toSeq === expect)
  }

  test("fewer than 15 days is rejected loudly (two init weeks + 1)") {
    intercept[IllegalArgumentException] {
      Holt.holtWinters(df(series(Seq.fill(14)(10L))))
    }
  }
}
