package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.BoostedStumps

/** Two-round boosted stumps on planted designs. */
class BoostedStumpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round 1 finds the true split on a step function; round 2 " +
    "finds the residual structure round 1 cannot explain") {
    // y = 100 if x1 <= 2 else 500, PLUS +40 if x2 <= 1 else 0 —
    // x1 carries the big step, x2 the residual step
    val per = Seq(
      (1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L),
      (5L, 1L), (5L, 3L), (6L, 0L), (6L, 2L))
      .map { case (x1, x2) =>
        (x1, x2, (if (x1 <= 2) 100L else 500L) +
          (if (x2 <= 1) 40L else 0L)) }
      .toDF("x1", "x2", "y")
    val out = BoostedStumps.twoRounds(per).orderBy("rnd").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out(0)._2 === "x1" && out(0)._3 === 2L,
      s"round 1 must split x1 at 2: ${out(0)}")
    assert(out(0)._4 === 4L && out(0)._5 === 4L)
    assert(out(1)._2 === "x2" && out(1)._3 === 1L,
      s"round 2 must split x2 at 1: ${out(1)}")
    // round-1 gain dominated by the 400-step; round-2 gain is the
    // 40-step on residuals — strictly smaller but positive
    assert(out(0)._6 > out(1)._6 && out(1)._6 > 0)
  }

  test("residuals after a perfect round-1 fit leave round 2 no gain") {
    // y depends only on x1; leaf means are exact → residuals all 0
    val per = Seq(
      (1L, 0L, 100L), (1L, 1L, 100L), (2L, 0L, 100L), (2L, 1L, 100L),
      (9L, 0L, 300L), (9L, 1L, 300L), (8L, 0L, 300L), (8L, 1L, 300L))
      .toDF("x1", "x2", "y")
    val out = BoostedStumps.twoRounds(per).orderBy("rnd").collect()
    assert(out(1).getDouble(5) === 0.0,
      "zero residual variance leaves no round-2 gain")
  }

  test("argmax ties break to the smallest threshold") {
    // y = 100, 200, 300 at x1 = 1, 2, 3: splitting at 1 and at 2
    // leave the same one-sided SSE of 5000·1e12 units² — an EXACT tie
    val per = Seq(
      (1L, 0L, 100L), (2L, 0L, 200L), (3L, 0L, 300L))
      .toDF("x1", "x2", "y")
    val b1 = BoostedStumps.twoRounds(per).filter($"rnd" === 1)
      .collect().head
    assert(b1.getLong(2) === 1L, "the tie must resolve to threshold 1")
  }

  test("non-default feature names flow through BOTH rounds and the " +
    "SQL twin (round-7 advisor: r2 once hardcoded x2)") {
    // same planted design, but the columns arrive swapped: the big
    // step lives in column 'x2', the residual step in column 'x1'
    val per = Seq(
      (1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L),
      (5L, 1L), (5L, 3L), (6L, 0L), (6L, 2L))
      .map { case (a, b) =>
        (b, a, (if (a <= 2) 100L else 500L) +
          (if (b <= 1) 40L else 0L)) }
      .toDF("x1", "x2", "y")
    val out = BoostedStumps.twoRounds(per, feature1 = "x2",
      feature2 = "x1").orderBy("rnd").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1, "x2", 2L)),
      s"round 1 must split the swapped big-step column: ${out(0)}")
    assert(out(1) === ((2, "x1", 1L)),
      s"round 2 must split the swapped residual column: ${out(1)}")
    // the twin parameterizes its residual CTE by feature2, never a
    // hardcoded x2
    val sql = BoostedStumps.twoRoundsSql("SELECT 1 AS x1, 2 AS x2, " +
      "3 AS y", feature1 = "x2", feature2 = "x1")
    assert(sql.contains("r2 AS (SELECT x1,"),
      "r2 must project the parameterized feature2 column")
  }
}
