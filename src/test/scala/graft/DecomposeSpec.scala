package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Decompose

/** Additive decomposition invariants on planted hourly series.
  * Outputs are BIGINT micro-units — the spec asserts EXACT integers
  * (no tolerance anywhere: there is no rounding convention left to
  * disagree about, which is the point of the integer contract). */
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
        assert(r.getLong(3) === 10000000L, "trend = 10.0 exactly")
        assert(r.getLong(4) === 0L)
        assert(r.getLong(5) === 0L)
      }
    }
  }

  test("missing hours gap-fill as (n = 0, y = 0) rather than " +
    "vanishing and shifting the windows") {
    val df = Seq((0L * H, 5.0), (2L * H, 5.0)).toDF("us", "value")
    val out = Decompose.hourlyAdditive(df).collect()
    assert(out.length === 3, "hour 1 must exist")
    val gap = out(1)
    assert(gap.getLong(1) === 0L && gap.getLong(2) === 0L)
  }

  test("y = trend + seasonal + remainder EXACTLY in micro-units, " +
    "and a planted spike surfaces as the max remainder") {
    val base = (0 until 96).map(h => 10.0 + (h % 24))
    val spiked = base.updated(50, base(50) + 100.0)
    val out = Decompose.hourlyAdditive(series(spiked)).collect()
    val mid = out.filter(r => !r.isNullAt(5))
    assert(mid.nonEmpty)
    mid.foreach { r =>
      val yMicro = r.getLong(2) * 10000L
      val recon = r.getLong(3) + r.getLong(4) + r.getLong(5)
      assert(yMicro === recon,
        s"additivity must be exact at h=${r.getLong(0)}")
    }
    val maxRem = mid.maxBy(_.getLong(5))
    assert(maxRem.getLong(0) === 50L,
      "the spike hour must own the largest remainder")
  }

  test("values that round ambiguously at 6 dp (the old half-ulp " +
    "trap) produce exact integers: cents x 400 trend, truncating " +
    "seasonal division replayed with BigInt") {
    // 25-h windows whose mean hits x.xxxxxx5 boundaries under
    // doubles; with integers there is nothing to round
    val vals = (0 until 72).map(h => 0.01 + 0.07 * (h % 5))
    val out = Decompose.hourlyAdditive(series(vals)).collect()
    val cents = vals.map(v => math.round(v * 100))
    // replay the definition with exact BigInt arithmetic
    val trend = cents.indices.map { h =>
      if (h < 12 || h >= 60) None
      else Some(BigInt((h - 12 to h + 12).map(cents).sum) * 400)
    }
    val detr = cents.indices.map(h =>
      trend(h).map(t => BigInt(cents(h)) * 10000 - t))
    val seasonal = (0 until 24).map { hod =>
      val ds = cents.indices.filter(_ % 24 == hod)
        .flatMap(detr(_))
      val s = ds.sum
      hod -> (if (s >= 0) s / ds.size else -((-s) / ds.size))
    }.toMap
    out.foreach { r =>
      val h = r.getLong(0).toInt
      trend(h) match {
        case None => assert(r.isNullAt(3))
        case Some(t) =>
          assert(BigInt(r.getLong(3)) === t)
          val sea = seasonal(h % 24)
          assert(BigInt(r.getLong(4)) === sea)
          assert(BigInt(r.getLong(5)) === detr(h).get - sea)
      }
    }
  }
}
