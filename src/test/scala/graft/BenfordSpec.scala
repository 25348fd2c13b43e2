package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Benford

/** Benford first-digit test on planted distributions. */
class BenfordSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(values: Seq[Long]): Array[(Int, Long, Double, Double)] =
    Benford.firstDigitTest(values.toDF("v"), "v")
      .orderBy("digit")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5)))

  test("hand-computed chi2 on a tiny fixture; absent digits " +
    "contribute their full expected-count term") {
    // 10 values, all starting with digit 1 -> n=10, obs(1)=10, rest 0
    val out = run(Seq(10L, 11L, 12L, 13L, 14L, 100L, 199L, 1L, 15L, 16L))
    val n = 10.0
    val byDigit = out.map(t => t._1 -> t).toMap
    // digit 1 term: (10 - 0.301030*10)^2 / (0.301030*10)
    val e1 = 0.301030 * n
    assert(byDigit(1)._2 === 10L)
    assert(math.abs(byDigit(1)._3 -
      BigDecimal((10.0 - e1) * (10.0 - e1) / e1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // absent digit 7: (0 - e)^2/e = e
    val e7 = 0.057992 * n
    assert(byDigit(7)._2 === 0L)
    assert(math.abs(byDigit(7)._3 - BigDecimal(e7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // total = sum of the nine rounded terms, identical on every row
    val total = out.map(t => BigDecimal(t._3)).sum.toDouble
    assert(out.forall(t => math.abs(t._4 - total) < 1e-9))
  }

  test("Benford-conformant geometric data scores far below uniform " +
    "fabricated data") {
    // powers of a slow geometric ratio cycle first digits per Benford
    val conformant = (0 until 2000).map(i =>
      math.round(math.pow(1.01, i) * 100.0))
    // fabricated: all values share first digit 5
    val fabricated = (0 until 2000).map(i => 500L + (i % 100))
    val chiC = run(conformant).head._4
    val chiF = run(fabricated).head._4
    assert(chiC < 30.0, s"conformant chi2 $chiC")
    assert(chiF > 1000.0, s"fabricated chi2 $chiF")
    assert(chiC < chiF / 50)
  }

  test("non-positive values are excluded") {
    val out = run(Seq(-5L, 0L, 20L, 21L))
    assert(out.map(_._2).sum === 2L)
  }
}
