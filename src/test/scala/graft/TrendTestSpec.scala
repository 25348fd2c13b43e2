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

  test("theil-sen: exact slope on a clean line, unmoved by one " +
    "planted outlier (where OLS would shift)") {
    // y = 2h: every pairwise slope is exactly 2
    val clean = TrendTest.theilSenHourly(
      series((0 until 9).map(h => 2.0 * h))).collect().head
    assert(clean.getLong(0) === 36L && clean.getDouble(1) === 2.0)
    // one wild outlier at h=4: only 8 of 36 pairs touch it; the
    // median pairwise slope is still exactly 2
    val vals = (0 until 9).map(h => if (h == 4) 1000.0 else 2.0 * h)
    val robust = TrendTest.theilSenHourly(series(vals)).collect().head
    assert(robust.getDouble(1) === 2.0,
      s"outlier moved the slope: ${robust.getDouble(1)}")
  }

  test("theil-sen even pair count picks the lower middle " +
    "deterministically") {
    // 2 hours -> 1 pair; 3 hours -> 3 pairs; use 2 points with slope
    // 5: single pair, rank (1+1) div 2 = 1
    val r = TrendTest.theilSenHourly(series(Seq(1.0, 6.0)))
      .collect().head
    assert(r.getLong(0) === 1L && r.getDouble(1) === 5.0)
    // 4 values -> 6 pairs, slopes {1,1,1,3,2,5/3...}: verify the pick
    // equals the sorted multiset's 3rd element ((6+1) div 2 = 3)
    val vals = Seq(0.0, 1.0, 2.0, 5.0)
    val slopes = (for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (vals(j) - vals(i)) / (j - i)).sorted
    val out = TrendTest.theilSenHourly(series(vals)).collect().head
    assert(out.getLong(0) === 6L)
    assert(math.abs(out.getDouble(1) - slopes(2)) < 1e-6)
  }
}
