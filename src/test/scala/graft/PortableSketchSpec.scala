package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.PortableSketch

/** Algorithm pins for the portable sketches (a3p / cms1p): the
  * harness oracle rows prove engine parity; these pin the SEMANTICS —
  * register construction replayed by hand, estimator accuracy on
  * planted cardinalities, and the count-min overestimate guarantee. */
class PortableSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5int48(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16)
  }

  test("hll: register state replays the hand-computed md5 registers") {
    val vals = Seq(101L, 202L, 303L, 404L, 505L)
    val df = vals.map(v => ("g", v)).toDF("grp", "v")
    val got = PortableSketch.hllDistinct(df, "grp", "v").head()
    // hand-build the registers with the same hash family
    val regs = scala.collection.mutable.Map[Int, Int]()
    vals.foreach { v =>
      val h = md5int48(v.toString)
      val idx = (h % 64).toInt
      val w = h / 64
      val rho = if (w == 0) 43
        else java.lang.Long.bitCount((w & -w) - 1) + 1
      regs(idx) = math.max(regs.getOrElse(idx, 0), rho)
    }
    val zscaled = regs.values.map(r => 1L << (43 - r)).sum
    assert(got.getAs[Long]("nreg") === regs.size.toLong)
    assert(got.getAs[Long]("zscaled") === zscaled)
    val denom = BigInt(zscaled) + BigInt(64 - regs.size) * (1L << 43)
    val est = (BigInt(709) * 64 * 64 * (1L << 43) / (10 * denom)).toLong
    assert(got.getAs[Long]("est_e2") === est)
  }

  test("hll: estimates track planted cardinalities within HLL " +
    "tolerance at m=64") {
    val df = ((0 until 500).map(i => ("big", i.toLong)) ++
      (0 until 50).map(i => ("small", i.toLong + 10000)))
      .toDF("grp", "v")
    val got = PortableSketch.hllDistinct(df, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_e2"))
      .toMap
    assert(math.abs(got("big") / 100.0 - 500) / 500.0 <= 0.35,
      s"big-group estimate ${got("big") / 100.0} vs 500")
    assert(math.abs(got("small") / 100.0 - 50) / 50.0 <= 0.35,
      s"small-group estimate ${got("small") / 100.0} vs 50")
    assert(got("big") > got("small"))
  }

  test("bloom: no false negatives (pass ⊇ exact); summary arithmetic " +
    "consistent; tiny-filter fp pressure measurable") {
    val build = (0 until 100).map(i => i.toLong * 3).toDF("bk")
    val probe = (0 until 600).map(_.toLong).toDF("pk")
    val got = PortableSketch.bloomStats(build, "bk", probe, "pk")
      .head()
    val (nk, np, ne, nfp) = (got.getAs[Long]("n_keys"),
      got.getAs[Long]("n_pass"), got.getAs[Long]("n_exact"),
      got.getAs[Long]("n_fp"))
    assert(nk === 600L)
    assert(ne === 100L) // build keys are 3i for i < 100 (max 297)
    assert(np >= ne, "false negative: a built key failed the probe")
    assert(nfp === np - ne)
    // 16 Kbits over 100 keys x 5 hashes: fp rate ~(1-e^(-500/16384))^5
    // ~ 2e-8 — with this fixed hash family the count is deterministic
    assert(nfp <= 2, s"unexpected fp count $nfp for a near-empty filter")
  }

  test("cms: every point estimate >= the exact count; most keys " +
    "collision-free at 4x256") {
    val rows = (0 until 2000).map { i =>
      (s"k${i % 20}", i) // 20 keys, 100 rows each
    }.toDF("key", "x")
    val got = PortableSketch.cmsEstimates(rows, "key")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("est_n"),
        r.getAs[Long]("exact_n")))
    assert(got.length === 20)
    got.foreach { case (k, est, exact) =>
      assert(est >= exact, s"$k: CM underestimated ($est < $exact)")
    }
    // 20 keys into 256 cells per row, min over 4 rows: the chance a
    // key collides in ALL FOUR rows is ~(19/256)^4 ≈ 3e-5 — with the
    // fixed hash family this is deterministic; assert all exact
    assert(got.count { case (_, est, exact) => est === exact } === 20)
  }
}
