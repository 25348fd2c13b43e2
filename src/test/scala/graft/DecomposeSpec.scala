package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Decompose

/** Additive decomposition invariants on planted hourly series. */
class DecomposeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L

  private def series(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, h) => (h * H + 7L, v) }
      .toDF("us", "value")

  test("a constant series decomposes to itself: trend = y, seasonal " +
    "= 0, remainder = 0 wherever the window is complete") {
    val out = Decompose.hourlyAdditive(series(Seq.fill(72)(10.0)))
      .collect()
    assert(out.length === 72)
    out.foreach { r =>
      if (r.getLong(0) < 12 || r.getLong(0) >= 60)
        assert(r.isNullAt(3) && r.isNullAt(5),
          "incomplete 25-h windows leave trend/remainder NULL")
      else {
        assert(r.getDouble(3) === 10.0)
        assert(math.abs(r.getDouble(4)) < 1e-9)
        assert(math.abs(r.getDouble(5)) < 1e-9)
      }
    }
  }

  test("missing hours gap-fill as (n = 0, y = 0) rather than " +
    "vanishing and shifting the windows") {
    val df = Seq((0L * H, 5.0), (2L * H, 5.0)).toDF("us", "value")
    val out = Decompose.hourlyAdditive(df).collect()
    assert(out.length === 3, "hour 1 must exist")
    val gap = out(1)
    assert(gap.getLong(1) === 0L &&
      gap.getDecimal(2).doubleValue() === 0.0)
  }

  test("y = trend + seasonal + remainder to rounding tolerance, and " +
    "a planted spike surfaces as the max remainder") {
    val base = (0 until 96).map(h => 10.0 + (h % 24))
    val spiked = base.updated(50, base(50) + 100.0)
    val out = Decompose.hourlyAdditive(series(spiked)).collect()
    val mid = out.filter(r => !r.isNullAt(5))
    mid.foreach { r =>
      val y = r.getDecimal(2).doubleValue()
      val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(y - recon) < 1e-5,
        s"additivity violated at h=${r.getLong(0)}: $y vs $recon")
    }
    val maxRem = mid.maxBy(_.getDouble(5))
    assert(maxRem.getLong(0) === 50L,
      "the spike hour must own the largest remainder")
  }
}
