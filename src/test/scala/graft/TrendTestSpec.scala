package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.TrendTest

/** Mann–Kendall on planted hourly series with hand-computed
  * statistics. */
class TrendTestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L

  private def series(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, h) => (h * H + 1L, v) }
      .toDF("us", "value")

  test("a strictly increasing series maxes S and clears the 1.96 " +
    "significance bar; decreasing mirrors it") {
    val up = TrendTest.mannKendallHourly(series((1 to 10).map(_.toDouble)))
      .collect().head
    assert(up.getLong(0) === 10L && up.getLong(1) === 45L)
    // var = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert(math.abs(up.getDouble(2) - 125.0) < 1e-9)
    assert(math.abs(up.getDouble(3) - 44.0 / math.sqrt(125.0)) < 1e-5)
    assert(up.getDouble(3) > 1.96)
    val down = TrendTest
      .mannKendallHourly(series((1 to 10).reverse.map(_.toDouble)))
      .collect().head
    assert(down.getLong(1) === -45L)
    assert(math.abs(down.getDouble(3) + up.getDouble(3)) < 1e-9,
      "continuity correction is symmetric")
  }

  test("a constant series is a single tie group: S = 0, Var = 0, " +
    "z = 0 — no division by zero") {
    val r = TrendTest.mannKendallHourly(series(Seq.fill(6)(7.0)))
      .collect().head
    assert(r.getLong(1) === 0L && r.getDouble(2) === 0.0 &&
      r.getDouble(3) === 0.0)
  }

  test("tie correction matches the hand-computed [1,1,2] case") {
    val r = TrendTest.mannKendallHourly(series(Seq(1.0, 1.0, 2.0)))
      .collect().head
    assert(r.getLong(1) === 2L)
    // n-part 3*2*11=66, tie group of 2 -> 18; var=(66-18)/18
    assert(math.abs(r.getDouble(2) - 48.0 / 18) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(48.0 / 18)) < 1e-6)
  }
}
