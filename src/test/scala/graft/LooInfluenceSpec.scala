package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LooInfluence

/** Exact LOO influence on planted designs: on-line points have zero
  * influence, an outlier dominates, and every output matches a BigInt
  * replay of the integer closed form. */
class LooInfluenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("points exactly on the fitted line have zero influence; an " +
    "off-line outlier owns the largest absolute influence") {
    // 5 points on y = 2x + 1, one gross outlier at x = 6
    val rows = Seq(
      (1L, 1L, BigDecimal(3)), (2L, 2L, BigDecimal(5)),
      (3L, 3L, BigDecimal(7)), (4L, 4L, BigDecimal(9)),
      (5L, 5L, BigDecimal(11)), (6L, 6L, BigDecimal(100)))
    val out = LooInfluence.influence(
      rows.toDF("id", "x", "y"), "id", "x", "y", lit(true))
      .collect().map(r => r.getLong(0) -> r.getLong(7)).toMap
    // dropping the outlier restores the perfect line: its held-out
    // prediction moves a LOT; every other point's held-out fit is
    // still outlier-contaminated either way, but the outlier must
    // dominate in absolute influence
    val maxAbs = out.maxBy { case (_, v) => math.abs(v) }
    assert(maxAbs._1 === 6L,
      s"outlier must own the largest |influence|: $out")
    // and with NO outlier, every point is on the line: influence 0
    val clean = LooInfluence.influence(
      rows.init.toDF("id", "x", "y"), "id", "x", "y", lit(true))
      .collect()
    clean.foreach { r =>
      assert(r.getLong(7) === 0L,
        s"on-line point ${r.getLong(0)} must have zero influence")
      assert(r.getLong(3) === 2000000L, "full slope = 2.0 exactly")
      assert(r.getLong(4) === 2000000L, "held-out slope = 2.0 exactly")
    }
  }

  test("every output matches an exact BigInt replay of the " +
    "truncating closed form (negative influences included)") {
    val rows = Seq(
      (1L, 3L, BigDecimal("10.01")), (2L, 5L, BigDecimal("20.07")),
      (3L, 1L, BigDecimal("5.55")), (4L, 8L, BigDecimal("33.33")),
      (5L, 2L, BigDecimal("12.12")), (6L, 7L, BigDecimal("28.99")))
    val out = LooInfluence.influence(
      rows.toDF("id", "x", "y"), "id", "x", "y", lit(true))
      .collect().sortBy(_.getLong(0))
    def sdiv(a: BigInt, b: BigInt) = if (a >= 0) a / b else -((-a) / b)
    val xs = rows.map(r => BigInt(r._2))
    val yc = rows.map(r => (r._3 * 100).toBigInt)
    def fit(ix: Seq[Int]): (BigInt, BigInt, BigInt, BigInt, BigInt) = {
      val n = BigInt(ix.size)
      val sx = ix.map(xs).sum; val sy = ix.map(yc).sum
      val sxx = ix.map(i => xs(i) * xs(i)).sum
      val sxy = ix.map(i => xs(i) * yc(i)).sum
      val det = n * sxx - sx * sx
      val nb = n * sxy - sx * sy
      (n, sx, sy, det, nb)
    }
    rows.indices.foreach { i =>
      val r = out(i)
      val (n, sx, sy, det, nb) = fit(rows.indices)
      val (nL, sxL, syL, detL, nbL) = fit(rows.indices.filter(_ != i))
      def pred(n: BigInt, sx: BigInt, sy: BigInt, det: BigInt,
          nb: BigInt) =
        sdiv((sy * det + nb * (n * xs(i) - sx)) * 10000, n * det)
      val pf = pred(n, sx, sy, det, nb)
      val pl = pred(nL, sxL, syL, detL, nbL)
      assert(BigInt(r.getLong(3)) === sdiv(nb * 10000, det))
      assert(BigInt(r.getLong(4)) === sdiv(nbL * 10000, detL))
      assert(BigInt(r.getLong(5)) === pf)
      assert(BigInt(r.getLong(6)) === pl)
      assert(BigInt(r.getLong(7)) === pf - pl)
    }
    assert(out.exists(_.getLong(7) < 0L),
      "fixture must exercise negative influences")
  }

  test("singular designs (constant x, or n < 3) yield NULLs") {
    val const = Seq((1L, 2L, BigDecimal(1)), (2L, 2L, BigDecimal(2)),
      (3L, 2L, BigDecimal(3)))
    LooInfluence.influence(const.toDF("id", "x", "y"),
      "id", "x", "y", lit(true)).collect()
      .foreach(r => (3 to 7).foreach(i => assert(r.isNullAt(i))))
    // n = 3 with distinct x: held-out designs have 2 points — a valid
    // line; but drop to n = 2 total and the guard nulls everything
    val two = Seq((1L, 1L, BigDecimal(1)), (2L, 2L, BigDecimal(2)))
    LooInfluence.influence(two.toDF("id", "x", "y"),
      "id", "x", "y", lit(true)).collect()
      .foreach(r => (3 to 7).foreach(i => assert(r.isNullAt(i))))
  }
}
