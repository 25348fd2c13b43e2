package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Checks

/** Batch-over-batch profile drift (dq10): the null-rate and
  * distinct-collapse gates fire on planted drift, clean columns stay
  * quiet, and NULL metrics (empty reference) never poison the flag. */
class ProfileDriftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null-rate jump and distinct collapse each flag their column; " +
    "an unchanged column does not flag") {
    // ref: 100 rows, no nulls, cat has 10 distinct values
    val ref = (0 until 100).map(i =>
      (i.toLong, s"c${i % 10}", i.toDouble)).toDF("id", "cat", "v")
    // cur: v null for 20% of rows (>1pp gate), cat collapsed to 2
    // distinct (<0.5x gate), id untouched
    val cur = (0 until 100).map(i =>
      (i.toLong, s"c${i % 2}",
        if (i % 5 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(i.toDouble)))
      .toDF("id", "cat", "v")
    val out = Checks.profileDrift(ref, cur,
      numericCols = Seq("id", "v"), stringCols = Seq("cat"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("v").getAs[Boolean]("drifted"),
      "20% null rate must trip the 1pp gate")
    assert(out("v").getAs[Long]("null_drift_e6") === 200000L)
    assert(out("cat").getAs[Boolean]("drifted"),
      "10 -> 2 distinct must trip the halved gate")
    assert(out("cat").getAs[Long]("distinct_ratio_e6") === 200000L)
    assert(!out("id").getAs[Boolean]("drifted"), "clean column quiet")
    assert(out("id").getAs[Long]("distinct_ratio_e6") === 1000000L)
  }

  test("range_expanded reflects stored extrema; string columns stay " +
    "NULL there") {
    val ref = Seq((1L, "a", 5.0), (2L, "b", 10.0)).toDF("id", "cat", "v")
    val cur = Seq((1L, "a", 3.0), (2L, "b", 10.0)).toDF("id", "cat", "v")
    val out = Checks.profileDrift(ref, cur,
      numericCols = Seq("v"), stringCols = Seq("cat"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("v").getAs[Boolean]("range_expanded"),
      "cur min 3 < ref min 5 expands the range")
    assert(out("cat").isNullAt(out("cat").fieldIndex("range_expanded")))
  }

  test("empty reference: NULL rates and ratios, but drifted is a " +
    "real boolean (coalesced), never NULL") {
    val ref = Seq.empty[(Long, Double)].toDF("id", "v")
    val cur = Seq((1L, 2.0)).toDF("id", "v")
    val out = Checks.profileDrift(ref, cur,
      numericCols = Seq("id", "v"), stringCols = Nil).collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("null_rate_ref_e6")))
      assert(r.isNullAt(r.fieldIndex("distinct_ratio_e6")))
      assert(!r.isNullAt(r.fieldIndex("drifted")),
        "flag must coalesce NULL terms to false")
      assert(!r.getAs[Boolean]("drifted"))
    }
  }
}
