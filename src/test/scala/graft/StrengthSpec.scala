package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Decompose

/** Decomposition strength (x94): a pure linear trend scores exactly
  * 10⁶ trend strength with NULL seasonal strength (zero detrended
  * variance is "no seasonal signal", not 0), a strong hour-of-day
  * pattern scores near-1 seasonal strength, and a constant series is
  * all-NULL. */
class StrengthSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // one event per hour for `hours` hours; us at exact hour starts
  private def hourly(hours: Int)(value: Int => Double) = {
    import spark.implicits._
    (0 until hours).map(h =>
      (h.toLong * 3600000000L, value(h))).toDF("us", "value")
  }

  test("pure linear trend: trend strength exactly 1e6, seasonal NULL") {
    val out = Decompose.strength(hourly(80)(h => 10.0 + h)).collect()(0)
    assert(out.getLong(0) === 80L - 24L, "edge hours excluded")
    assert(out.isNullAt(1),
      "a trend-only series has no detrended variance to explain")
    assert(out.getLong(2) === 1000000L,
      "the 25-row centered mean recovers a line exactly")
  }

  test("strong hour-of-day pattern + small noise: seasonal strength " +
    "dominates") {
    val pattern = Array.tabulate(24)(i => 100.0 + 50.0 * (i % 12))
    val out = Decompose.strength(
      hourly(24 * 5)(h => pattern(h % 24) + (h * 7) % 5))
      .collect()(0)
    assert(out.getLong(1) > 900000L,
      s"seasonal pattern explains almost everything: ${out.getLong(1)}")
    assert(out.getLong(1) > out.getLong(2),
      "seasonal strength exceeds trend strength on a periodic series")
  }

  test("a NOISELESS periodic series is fully explained by both views " +
    "(remainder exactly zero — the integer pipeline loses nothing)") {
    val pattern = Array.tabulate(24)(i => 100.0 + 50.0 * (i % 12))
    val out = Decompose.strength(hourly(24 * 5)(h => pattern(h % 24)))
      .collect()(0)
    assert(out.getLong(1) === 1000000L && out.getLong(2) === 1000000L)
  }

  test("constant series: both strengths NULL (nothing to explain)") {
    val out = Decompose.strength(hourly(80)(_ => 42.0)).collect()(0)
    assert(out.isNullAt(1) && out.isNullAt(2))
  }
}
