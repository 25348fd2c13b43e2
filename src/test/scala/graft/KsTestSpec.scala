package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.quality.Checks

/** Two-sample KS (dq11): identical samples give D = 0 and no drift; a
  * pure location shift gives the hand-computable D; the integer
  * squared-form verdict agrees with the double critical value it
  * shadows; multiple metrics ride one call independently. */
class KsTestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("identical samples: d_e6 = 0, not drifted; disjoint shift: " +
    "D = 1 exactly") {
    import spark.implicits._
    val ref = (1L to 100L).toDF("v")
    val same = Checks.ksTest(ref, (1L to 100L).toDF("v"),
      Seq("v" -> col("v"))).collect()(0)
    assert(same.getLong(1) === 100L && same.getLong(2) === 100L)
    assert(same.getLong(3) === 0L, "identical ⇒ D = 0")
    assert(!same.getBoolean(5), "identical ⇒ not drifted")
    // fully disjoint supports: D = 1 (cur entirely above ref)
    val far = Checks.ksTest(ref, (201L to 300L).toDF("v"),
      Seq("v" -> col("v"))).collect()(0)
    assert(far.getLong(3) === 1000000L, "disjoint ⇒ D = 1")
    assert(far.getBoolean(5))
  }

  test("half-overlap shift: D = 0.5 exact; verdict matches the " +
    "critical value the crit_e6 column reports") {
    import spark.implicits._
    val r = Checks.ksTest(
      (1L to 100L).toDF("v"), (51L to 150L).toDF("v"),
      Seq("v" -> col("v"))).collect()(0)
    assert(r.getLong(3) === 500000L, "D = max at v=100: |100/100-50/100|")
    val crit = math.floor(
      1.358 * math.sqrt(200.0 / 10000.0) * 1000000).toLong
    assert(r.getLong(4) === crit, "crit_e6 replays the formula")
    assert(r.getBoolean(5) === (r.getLong(3) > crit),
      "integer verdict agrees with the double gate here")
  }

  test("metrics are independent within one call; null bins drop") {
    import spark.implicits._
    val ref = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None))
      .toDF("a", "b")
    val cur = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)))
      .toDF("a", "b")
    val out = Checks.ksTest(ref, cur,
      Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") === ((3L, 3L, 0L)), "identical a-columns")
    assert(out("b")._1 === 2L, "ref null b dropped from its metric only")
    assert(out("b")._2 === 3L)
  }
}
