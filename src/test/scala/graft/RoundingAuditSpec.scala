package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.audit.RoundingAudit

/** Rounding-robustness audit (round-8): classification unit pins plus
  * a live re-audit of every query the sf0.001 sweep ever flagged as
  * INEXACT (the engine-divergent class) — all must now be clean.
  * ROUNDING_AUDIT.md carries the full-surface run at sf0.01. */
class RoundingAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("classifyDouble separates no-tie / exact-tie / inexact-tie") {
    // true binary ties: the boundary value IS the double
    assert(RoundingAudit.classifyDouble(2.5, 0) === 1)
    assert(RoundingAudit.classifyDouble(-2.5, 0) === 1)
    assert(RoundingAudit.classifyDouble(51.40625, 4) === 1)
    assert(RoundingAudit.classifyDouble(0.03125, 4) === 1)
    // inexact string-ties: shortest repr ends in 5 at the scale but
    // the binary value is NOT the boundary — the ml15/x70 killer
    assert(RoundingAudit.classifyDouble(2.6788205, 6) === 2)
    assert(RoundingAudit.classifyDouble(3.4033945, 6) === 2)
    assert(RoundingAudit.classifyDouble(0.16875, 4) === 2)
    // plain values: no tie anywhere
    assert(RoundingAudit.classifyDouble(2.4999999999999996, 0) === 0)
    assert(RoundingAudit.classifyDouble(51.4063, 4) === 0)
    assert(RoundingAudit.classifyDouble(1.0 / 3.0, 6) === 0)
    // at 0 dp sub-2^52 doubles can only tie EXACTLY (the q6 design
    // argument: round(x*1e6) is convention-safe)
    assert(RoundingAudit.classifyDouble(3403394.5, 0) === 1)
    assert(RoundingAudit.classifyDouble(3403394.4999999995, 0) === 0)
  }

  test("every query the audit ever flagged INEXACT is now clean at " +
    "sf0.001 (q6/e4 integer discipline applied)") {
    val sf = "/root/testdata/sf0.001"
    val flagged = Seq("t27_quality_filter", "t28_lm_perplexity",
      "d2_minhash_lsh_pairs", "q7_above_avg_customers",
      "ml15_linear_shap", "x70_stl_decompose",
      "ml19_permutation_importance")
    val qs = SparkEntry.queries
    flagged.foreach { name =>
      RoundingAudit.auditOne(spark, name, qs(name), sf) match {
        case a: RoundingAudit.Audited =>
          assert(a.inexactTie === 0L,
            s"$name regressed to inexact ties: ${a.tag}")
        case RoundingAudit.NoRound => // fully integer now — fine
        case f: RoundingAudit.Failed => fail(s"$name: ${f.tag}")
      }
    }
  }

  test("the oracle-only ledger stays in sync with the registry") {
    val oracle = SparkEntry.oracleSql
    RoundingAudit.oracleOnlyJustified.foreach { case (n, why) =>
      assert(SparkEntry.queries.contains(n), s"stale ledger entry $n")
      assert(oracle.get(n).exists(_.toLowerCase.contains("round(")),
        s"ledgered $n has no round( in its oracle twin: $why")
    }
  }
}
