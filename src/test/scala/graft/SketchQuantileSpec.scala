package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two qs1 properties the oracle can't state: the KMV sample is
  * merge-order independent (min-of-hashes is commutative — the claim
  * that lets a sketch built across 1000 executors reproduce), and the
  * rank-picked estimates land within the KMV error bound of the true
  * quantiles. */
class SketchQuantileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def kept(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    import graft.agg.{TopItem, TopK}
    df.select(col("g"),
        expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), " +
          "16, 10) AS BIGINT)").as("h"), col("id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, h, id) => TopItem(-h.toDouble, id) }
      .agg(new TopK(64).toColumn.name("keep"))
      .toDF("g", "keep")
      .select(explode(col("keep")).as("item"))
      .select(col("item.id")).collect().map(_.getLong(0)).toSet
  }

  test("KMV sample is identical under different partitionings " +
    "(merge-order independence)") {
    import spark.implicits._
    val base = (1L to 500L).map(i => (s"g${i % 3}", i))
      .toDF("g", "id")
    val a = kept(base.repartition(1))
    val b = kept(base.repartition(13))
    assert(a === b, "sample must not depend on partitioning")
    assert(a.size === 3 * 64)
  }

  test("qs1 estimates sit within the KMV error bound of the true " +
    "quantiles (q50 true-CDF position in [0.25, 0.75])") {
    val est = SparkEntry.queries("qs1_quantile_sketch")(spark, dir)
      .select(col("event_type"), col("q50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ev = graft.queries.PipelineQueries.table(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).cache()
    est.foreach { case (t, q50) =>
      val grp = ev.filter(col("event_type") === t)
      val n = grp.count().toDouble
      val below = grp.filter(col("value") <= q50).count().toDouble
      val pos = below / n
      assert(pos >= 0.25 && pos <= 0.75,
        s"$t: q50 estimate at true CDF position $pos")
    }
  }
}
