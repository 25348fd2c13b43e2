package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.PermutationImportance

/** Permutation importance on planted signal/noise features. */
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
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    // base SSE ~ 0 (perfect fit) -> guard yields NULL importances OR
    // tiny base; tolerate both by checking the permuted deltas
    val (b1, p1, _) = out("x1")
    val (_, p2, _) = out("x2")
    assert(p1 > b1 + 1.0, s"signal feature must inflate SSE: $b1 -> $p1")
    assert(math.abs(p2 - b1) < 1e-3,
      s"noise feature must not move SSE: $b1 -> $p2")
  }

  test("importance ranks the stronger of two signal features higher") {
    // y = 20*x1 + 2*x2 + small nonlinearity so base SSE > 0
    val rows = (1 to 60).map { i =>
      val x1 = (i % 5).toLong
      val x2 = ((i * 7) % 11).toLong
      (i.toLong, x1, x2, BigDecimal(20 * x1 + 2 * x2 + (i % 3)))
    }
    val out = PermutationImportance.importance(
      rows.toDF("id", "x1", "x2", "y"), "id", "x1", "x2", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("x1") > out("x2"),
      s"x1 ${out("x1")} must outrank x2 ${out("x2")}")
    assert(out("x2") > 0, "even the weak signal inflates SSE")
  }
}
