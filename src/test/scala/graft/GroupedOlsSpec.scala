package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.GroupedOls

/** Per-segment OLS (ml26): exact recovery of planted lines, NULL on
  * singular designs, sign-safe negative slopes, and the harness
  * query's FK-grain pre-aggregation proven equal to the direct
  * row-grain fit (the statistics are additive — the 100 TB shape
  * changes the plan, never the numbers). */
class GroupedOlsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("planted lines recovered exactly; singular design yields NULL; " +
    "negative slope truncates sign-safely") {
    import spark.implicits._
    // A: exactly y = 2 + 3x (dollars); B: all x equal (singular);
    // C: y = 10 - 0.5x (negative slope, exact halves in cents)
    val rows = Seq(
      ("A", 1L, "5.00"), ("A", 2L, "8.00"), ("A", 3L, "11.00"),
      ("B", 4L, "1.00"), ("B", 4L, "2.00"), ("B", 4L, "3.00"),
      ("C", 2L, "9.00"), ("C", 4L, "8.00"), ("C", 6L, "7.00"))
      .toDF("g", "x", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val out = GroupedOls.lines(rows, "g", "x", "y").collect()
    assert(out.length === 3)
    val a = out(0)
    assert(a.getString(0) === "A" && a.getLong(1) === 3L)
    assert(a.getLong(2) === 3000000L, "slope 3.0 exact")
    assert(a.getLong(3) === 2000000L, "intercept 2.0 exact")
    val b = out(1)
    assert(b.isNullAt(2) && b.isNullAt(3), "singular design → NULL")
    val c = out(2)
    assert(c.getLong(2) === -500000L, "slope -0.5 exact, sign-safe")
    assert(c.getLong(3) === 10000000L, "intercept 10.0 exact")
  }

  test("harness brandLines equals the direct row-grain fit (FK-grain " +
    "pre-aggregation changes the plan, not the numbers)") {
    val dir = "/root/testdata/sf0.001"
    val direct = GroupedOls.lines(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/part.parquet"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_quantity"),
          col("l_extendedprice")),
      "p_brand", "l_quantity", "l_extendedprice")
      .collect().toSeq
    val staged = GroupedOls.brandLines(spark, dir).collect().toSeq
    assert(staged.map(r => (r.getString(0), r.getLong(1), r.get(2),
      r.get(3))) ===
      direct.map(r => (r.getString(0), r.getLong(1), r.get(2),
        r.get(3))))
  }
}
