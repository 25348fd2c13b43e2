package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ids

/** The two-phase id/rank/cumsum machinery every converted window rides.
  *
  * The contiguity tests run on a SKEWED fixture at higher partition
  * counts than the data strictly needs — the round-11 boundary bug
  * (two non-reused range exchanges sampling different boundaries, so
  * the window leg and the offsets leg disagreed) materialized as
  * non-contiguous ranks, so "the rank set is EXACTLY 1..n" is the
  * regression oracle for the localCheckpoint that pins the snapshot. */
class IdsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 60k rows, zipf-skewed keys (key 0 holds ~half), shuffled order. */
  private lazy val skewed = {
    val rows = (0 until 60000).map { i =>
      val k = if (i % 2 == 0) 0L else (i % 37).toLong
      // a value column that collides a lot (ties) + a unique id
      (k, (i * 2654435761L % 1000).toLong, i.toLong)
    }
    spark.createDataset(rows).toDF("key", "v", "uid")
      .repartition(16, col("uid"))
  }

  test("withOrderedIds: ids are EXACTLY 1..n (no gap, no dup) and " +
    "ordered by the key — under AQE and more partitions than needed") {
    val keyed = skewed.withColumn("__ord", concat(
      Ids.fixedWidthKey(col("v"), 20), Ids.fixedWidthKey(col("uid"), 20)))
    val out = Ids.withOrderedIds(keyed, "__ord", "id", partitions = 16)
    val n = 60000L
    val stats = out.agg(count(lit(1)), countDistinct(col("id")),
      min(col("id")), max(col("id")), sum(col("id"))).collect().head
    assert(stats.getLong(0) === n)
    assert(stats.getLong(1) === n, "ids must be distinct")
    assert(stats.getLong(2) === 1L && stats.getLong(3) === n,
      "ids must span exactly 1..n")
    assert(stats.getLong(4) === n * (n + 1) / 2,
      "id sum must equal n(n+1)/2 — any misaligned offset breaks this")
    // order agreement: the id order IS the key order
    val misordered = out.select(col("__ord"), col("id"))
      .join(out.select(col("__ord").as("o2"), col("id").as("id2")),
        col("id2") === col("id") + 1)
      .filter(col("o2") < col("__ord")).count()
    assert(misordered === 0L)
  }

  test("keyedCumsum: per-key running sums end at the per-key totals " +
    "and every prefix is consistent on a skewed fixture") {
    val out = Ids.keyedCumsum(skewed.withColumn("one", lit(1L)),
      "key", Seq("v", "uid"), "one", "rn", partitions = 16)
    // rank contiguity per key: sum of 1..n_k per key
    val perKey = out.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"),
        sum(col("rn")).as("s"), countDistinct(col("rn")).as("d"))
      .collect()
    perKey.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) === n, s"key ${r.get(0)}: max rank != n")
      assert(r.getLong(4) === n, s"key ${r.get(0)}: dup ranks")
      assert(r.getLong(3) === n * (n + 1) / 2, s"key ${r.get(0)}: gap")
    }
    // weighted: cumsum of v ends at the groupBy total per key
    val w = Ids.keyedCumsum(skewed, "key", Seq("v", "uid"), "v", "cum",
      partitions = 16)
    val ends = w.groupBy(col("key")).agg(max(col("cum")).as("endcum"))
    val tots = skewed.groupBy(col("key")).agg(sum(col("v")).as("tot"))
    assert(ends.join(tots, "key")
      .filter(col("endcum") =!= col("tot")).count() === 0L)
  }

  test("exactNtile matches ntile() semantics: bucket sizes differ by " +
    "at most one, earlier buckets are never smaller, ranks map " +
    "monotonically") {
    val keyed = skewed.limit(1003).withColumn("__ord", concat(
      Ids.fixedWidthKey(col("v"), 20), Ids.fixedWidthKey(col("uid"), 20)))
    val ranked = Ids.withOrderedIds(keyed, "__ord", "rnk")
    val out = Ids.exactNtile(ranked, "rnk", 8, "b")
    val sizes = out.groupBy(col("b")).agg(count(lit(1)).as("c"),
        min(col("rnk")).as("lo"), max(col("rnk")).as("hi"))
      .orderBy("b").collect()
    assert(sizes.map(_.getInt(0)).toSeq === (1 to 8))
    val cs = sizes.map(_.getLong(1))
    assert(cs.max - cs.min <= 1 && cs.sum === 1003L)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
      "ntile gives the +1 rows to the FIRST buckets")
    // contiguous rank ranges: bucket k's lo = bucket k-1's hi + 1
    val bounds = sizes.map(r => (r.getLong(2), r.getLong(3)))
    assert(bounds.head._1 === 1L)
    bounds.zip(bounds.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 === hi + 1) }
  }

  test("fixedWidthKey fails loudly on negative and overlong inputs") {
    val ok = spark.range(5).select(
      Ids.fixedWidthKey(col("id"), 4).as("k")).collect()
    assert(ok.map(_.getString(0)).toSeq ===
      Seq("0000", "0001", "0002", "0003", "0004"))
    intercept[Exception] {
      spark.range(1).select(
        Ids.fixedWidthKey(lit(-3L), 4).as("k")).collect()
    }
    intercept[Exception] {
      spark.range(1).select(
        Ids.fixedWidthKey(lit(123456L), 4).as("k")).collect()
    }
  }
}
