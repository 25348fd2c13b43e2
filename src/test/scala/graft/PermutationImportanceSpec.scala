package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.PermutationImportance

/** Permutation importance on planted signal/noise features — BIGINT
  * micro-unit output surface (round-8 rounding audit). */
class PermutationImportanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("the feature carrying the signal inflates SSE when permuted; " +
    "a pure-noise feature does not") {
    // y = 10*x1 exactly; x2 is an irrelevant hash-spread column whose
    // permutation changes nothing (beta2 fits ~0)
    val rows = (1 to 40).map { i =>
      (i.toLong, (i % 7).toLong, ((i * 13) % 5).toLong,
        BigDecimal((i % 7) * 10))
    }
    val out = PermutationImportance.importance(
      rows.toDF("id", "x1", "x2", "y"), "id", "x1", "x2", "y")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // base SSE ~ 0 (perfect fit) -> guard yields NULL importances OR
    // tiny base; check the permuted deltas (micro-units)
    val (b1, p1) = out("x1")
    val (_, p2) = out("x2")
    assert(p1 > b1 + 1000000L,
      s"signal feature must inflate SSE: $b1 -> $p1")
    assert(math.abs(p2 - b1) < 1000L,
      s"noise feature must not move SSE: $b1 -> $p2")
  }

  test("importance ranks the stronger of two signal features higher " +
    "and the micro outputs are exact integers (no NULL on a " +
    "positive base)") {
    // y = 20*x1 + 2*x2 + small nonlinearity so base SSE > 0
    val rows = (1 to 60).map { i =>
      val x1 = (i % 5).toLong
      val x2 = ((i * 7) % 11).toLong
      (i.toLong, x1, x2, BigDecimal(20 * x1 + 2 * x2 + (i % 3)))
    }
    val out = PermutationImportance.importance(
      rows.toDF("id", "x1", "x2", "y"), "id", "x1", "x2", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (b1, p1, imp1) = out("x1")
    val (b2, p2, imp2) = out("x2")
    assert(b1 === b2, "base SSE is feature-independent")
    assert(imp1 > imp2, s"x1 $imp1 must outrank x2 $imp2")
    assert(imp2 > 0L, "even the weak signal inflates SSE")
    // importance_micro replays exactly: (p - b) * 1e6 / b truncated
    def sdiv(a: BigInt, b: BigInt) =
      if (a >= 0) a / b else -((-a) / b)
    assert(BigInt(imp1) ===
      sdiv((BigInt(p1) - BigInt(b1)) * 1000000, BigInt(b1)))
    assert(BigInt(imp2) ===
      sdiv((BigInt(p2) - BigInt(b2)) * 1000000, BigInt(b2)))
  }
}
