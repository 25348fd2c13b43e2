package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Concentration

/** Gini on hand-computed distributions. */
class ConcentrationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def g(values: Seq[Long]): Double =
    Concentration.gini(
      values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "y"), "k", "y")
      .collect().head.getDouble(2)

  test("perfect equality is 0; one-holder concentration is (n-1)/n") {
    assert(g(Seq(5L, 5L, 5L, 5L)) === 0.0)
    assert(g(Seq(0L, 0L, 0L, 12L)) === 0.75)
  }

  test("textbook case: {1,2,3,4} has G = 0.25") {
    // 2*(1+4+9+16) - 5*10 = 10; 4*10 = 40 -> 0.25
    assert(g(Seq(1L, 2L, 3L, 4L)) === 0.25)
  }

  test("tie order cancels: permuting equal values changes nothing") {
    val a = g(Seq(3L, 3L, 3L, 9L, 9L))
    val b = g(Seq(9L, 3L, 9L, 3L, 3L))
    assert(a === b)
    // hand-check: sorted 3,3,3,9,9; 2*(3+6+9+36+45)-6*27=36; 5*27=135
    assert(a === math.rint(36.0 / 135 * 1e6) / 1e6)
  }
}
