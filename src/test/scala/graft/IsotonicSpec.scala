package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Isotonic

/** Isotonic calibration via the minimax characterization: equals the
  * classical PAV pooling on hand-computed fixtures, is monotone, and
  * preserves already-monotone inputs exactly. */
class IsotonicSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long, Long)]): Seq[(Long, Double)] =
    Isotonic.calibrate(rows.toDF("score", "np", "nn"))
      .orderBy("score")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
      .toSeq

  test("already-monotone rates pass through unchanged") {
    // rates 0.1, 0.5, 0.9 strictly increasing -> fit == raw
    val out = fit(Seq((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L)))
    assert(out === Seq((1L, 0.1), (2L, 0.5), (3L, 0.9)))
  }

  test("a single violator pools with its neighbor (weighted PAV pool)") {
    // raw rates: s1 -> 0.8 (4/5), s2 -> 0.2 (1/5): decreasing, so PAV
    // pools both bins into one block of rate (4+1)/(5+5) = 0.5
    val out = fit(Seq((1L, 4L, 1L), (2L, 1L, 4L)))
    assert(out === Seq((1L, 0.5), (2L, 0.5)))
  }

  test("pooling cascades left like classical PAV") {
    // raw: 0.2, 0.6, 0.1 — pooling (0.6, 0.1) gives 0.35 which still
    // exceeds nothing on the left (0.2 < 0.35), so blocks are
    // {s1}=0.2, {s2,s3}=(3+1)/10=0.4... weights: s2=(3/5), s3=(1/10)
    val out = fit(Seq((1L, 1L, 4L), (2L, 3L, 2L), (3L, 1L, 9L)))
    // block {s2,s3}: (3+1)/(5+10) = 4/15 = 0.266667 > 0.2 -> stays
    assert(out === Seq((1L, 0.2), (2L, 0.266667), (3L, 0.266667)))
  }

  test("fit is always non-decreasing and weighted-mean preserving") {
    val rows = Seq((1L, 9L, 1L), (2L, 0L, 10L), (3L, 5L, 5L),
      (4L, 2L, 8L), (5L, 10L, 0L))
    val out = fit(rows)
    assert(out.map(_._2) === out.map(_._2).sorted)
    // total predicted positives == total observed positives (PAV is
    // mean-preserving within blocks, so globally too)
    val full = Isotonic.calibrate(rows.toDF("score", "np", "nn"))
      .collect().map(r => r.getDouble(4) * r.getLong(2)).sum
    // tolerance covers the 6dp output rounding (≤ n_tot · 5e-7)
    assert(math.abs(full - rows.map(_._2).sum) < 1e-3)
  }
}
