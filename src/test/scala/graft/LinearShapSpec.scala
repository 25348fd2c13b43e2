package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.LinearShap

/** Exact linear Shapley on the BIGINT micro-unit contract: recovers
  * a noiseless model exactly, attributions sum to pred − base BY
  * CONSTRUCTION, an orthogonal irrelevant feature gets exactly zero,
  * a singular design yields NULLs, and negative attributions match a
  * BigInt replay of the truncating-division definition (the
  * convention an engine's rounding mode can no longer perturb). */
class LinearShapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("noiseless y = 3 + 2 x1 - x2 is recovered exactly and " +
    "attributions reconstruct the prediction") {
    val data = Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 3L), (4L, 4L, 2L),
      (5L, 3L, 5L)
    ).map { case (id, a, b) => (id, a, b, BigDecimal(3 + 2 * a - b)) }
      .toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      assert(r.getLong(5) === 2000000L, "beta1 = 2.0 exactly")
      assert(r.getLong(6) === -1000000L, "beta2 = -1.0 exactly")
      val yMicro = r.getDecimal(3).unscaledValue().longValue() * 10000L
      assert(math.abs(r.getLong(9) - yMicro) <= 5L,
        "noiseless fit predicts y to within division truncation")
      assert(r.getLong(9) === r.getLong(4) + r.getLong(7) + r.getLong(8),
        "pred = base + phi1 + phi2 EXACTLY by construction")
    }
  }

  test("a feature orthogonal to both y and the other feature gets " +
    "attribution exactly zero") {
    val data = Seq(
      (1L, 1L, 1L, BigDecimal(2)), (2L, 1L, 2L, BigDecimal(2)),
      (3L, 2L, 1L, BigDecimal(4)), (4L, 2L, 2L, BigDecimal(4))
    ).toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      assert(r.getLong(6) === 0L, "beta2 exactly 0")
      assert(r.getLong(8) === 0L, "phi_x2 exactly 0")
    }
  }

  test("a collinear design yields NULL everywhere, never NaN") {
    val data = Seq(
      (1L, 1L, 2L, BigDecimal(1)), (2L, 2L, 4L, BigDecimal(2)),
      (3L, 3L, 6L, BigDecimal(3))
    ).toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      (4 to 9).foreach(i => assert(r.isNullAt(i),
        s"column $i must be NULL on det = 0"))
    }
  }

  test("negative and non-divisible attributions match an exact " +
    "BigInt replay of the truncating-division definition (the " +
    "boundary cases the old round(double, 6) left engine-dependent)") {
    // cent values chosen so betas/phis are NOT exactly representable
    // and several phis are negative — the old half-ulp exposure
    val rows = Seq(
      (1L, 3L, 7L, BigDecimal("10.01")),
      (2L, 5L, 2L, BigDecimal("20.07")),
      (3L, 1L, 9L, BigDecimal("5.555")),
      (4L, 8L, 4L, BigDecimal("33.33")),
      (5L, 2L, 6L, BigDecimal("12.125")),
      (6L, 7L, 1L, BigDecimal("28.99")))
    val data = rows.toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect().sortBy(_.getLong(0))

    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    // y quantizes to DECIMAL(18,2) HALF_UP, then exact cents
    val cents = rows.map(r =>
      BigInt(r._4.setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue()))
    val x1 = rows.map(r => BigInt(r._2)); val x2 = rows.map(r => BigInt(r._3))
    val n = BigInt(rows.size)
    def s(v: Seq[BigInt]) = v.sum
    def dot(a: Seq[BigInt], b: Seq[BigInt]) =
      a.zip(b).map { case (p, q) => p * q }.sum
    val (s1, s2, syc) = (s(x1), s(x2), s(cents))
    val a11 = n * dot(x1, x1) - s1 * s1
    val a22 = n * dot(x2, x2) - s2 * s2
    val a12 = n * dot(x1, x2) - s1 * s2
    val b1c = n * dot(x1, cents) - s1 * syc
    val b2c = n * dot(x2, cents) - s2 * syc
    val det = a11 * a22 - a12 * a12
    val beta1 = sdiv((a22 * b1c - a12 * b2c) * 10000, det)
    val beta2 = sdiv((a11 * b2c - a12 * b1c) * 10000, det)
    val base = sdiv(syc * 10000, n)
    rows.indices.foreach { i =>
      val r = out(i)
      val p1 = sdiv(beta1 * (n * x1(i) - s1), n)
      val p2 = sdiv(beta2 * (n * x2(i) - s2), n)
      assert(BigInt(r.getLong(4)) === base)
      assert(BigInt(r.getLong(5)) === beta1)
      assert(BigInt(r.getLong(6)) === beta2)
      assert(BigInt(r.getLong(7)) === p1)
      assert(BigInt(r.getLong(8)) === p2)
      assert(BigInt(r.getLong(9)) === base + p1 + p2)
    }
    assert(out.exists(_.getLong(7) < 0) || out.exists(_.getLong(8) < 0),
      "the planted data must actually exercise negative phis")
  }
}
