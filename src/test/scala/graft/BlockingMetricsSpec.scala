package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.er.BlockingMetrics

/** Blocking-quality report on a planted fixture with hand-counted
  * candidates, coverage, and ratios. */
class BlockingMetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("candidate count is the per-key product sum, coverage only " +
    "credits true matches inside the block, ratios divide exactly") {
    val clean = Seq((1L, "alpha"), (2L, "amber"), (3L, "brave"),
      (4L, "baker"), (5L, "crisp"), (6L, "azure"))
      .toDF("c_custkey", "c_name")
    // true match = same id; record 4's variant breaks the first letter
    val dirty = Seq((1L, "alpXa"), (2L, "amXer"), (4L, "Xaker"))
      .toDF("d_key", "dirty_name")
    val out = BlockingMetrics.report(dirty, clean, Seq(
      ("first1", substring(col("dirty_name"), 1, 1),
        substring(col("c_name"), 1, 1))))
      .collect().head
    // blocks: 'a' -> 2 dirty x 3 clean = 6; 'X' -> 1 x 0 = 0
    assert(out.getLong(1) === 3L && out.getLong(2) === 6L)
    assert(out.getLong(3) === 18L)
    // covered: 1 and 2 (same 'a' block as their true match); 4 lost
    assert(out.getLong(4) === 2L)
    assert(math.abs(out.getDouble(5) - 2.0 / 3) < 1e-6)
    assert(math.abs(out.getDouble(6) - (1.0 - 6.0 / 18)) < 1e-6)
  }

  test("a degenerate single-block scheme reports zero reduction and " +
    "full completeness — the trade-off the report exists to expose") {
    val clean = Seq((1L, "aa"), (2L, "ab")).toDF("c_custkey", "c_name")
    val dirty = Seq((1L, "ax"), (2L, "ay")).toDF("d_key", "dirty_name")
    val out = BlockingMetrics.report(dirty, clean, Seq(
      ("all_one_block", lit("k"), lit("k")))).collect().head
    assert(out.getDouble(5) === 1.0 && out.getDouble(6) === 0.0)
  }
}
