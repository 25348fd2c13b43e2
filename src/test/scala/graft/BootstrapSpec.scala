package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Bootstrap

/** Poisson-bootstrap CI: interval brackets the point estimate,
  * degenerate data collapses the interval to zero width, and draws
  * are run-invariant. */
class BootstrapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(n: Int, convEvery: Int) =
    (1L to n.toLong).flatMap { u =>
      val t = if (u % convEvery == 0) "purchase" else "view"
      Seq((u, t), (u, "view"))
    }.toDF("user_id", "event_type")

  test("the interval brackets the point estimate and has positive " +
    "width on non-degenerate data") {
    val r = Bootstrap.conversionDiffCi(events(200, 3)).collect().head
    assert(r.getLong(0) === 32L)
    val (p, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= p && p <= hi, s"CI [$lo, $hi] must bracket $p")
    assert(hi > lo, "resampling real data must produce spread")
  }

  test("universal conversion collapses every replicate diff to 0: " +
    "zero-width interval at 0") {
    val all = (1L to 40L).map(u => (u, "purchase"))
      .toDF("user_id", "event_type")
    val r = Bootstrap.conversionDiffCi(all).collect().head
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0 &&
      r.getDouble(3) === 0.0)
  }

  test("hash-driven draws are run-invariant") {
    val a = Bootstrap.conversionDiffCi(events(100, 4)).collect().head
    val b = Bootstrap.conversionDiffCi(events(100, 4)).collect().head
    assert(a === b)
  }
}
