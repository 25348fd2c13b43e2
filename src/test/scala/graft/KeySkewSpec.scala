package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Join-key skew report (dq12): internal consistency on real data —
  * the oracle certifies the values; this pins the semantics against
  * independent recomputation at the key grain. */
class KeySkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("percentile ordering, total conservation, hot-key argmax and " +
    "skew replay against an independent per-key recount") {
    val rows = SparkEntry.queries("dq12_key_skew")(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val total = li.count()
    rows.foreach { r =>
      val (name, nKeys, tot, mx, p50, p99, skew, hot) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(tot === total, s"$name conserves the fact rowcount")
      assert(p50 <= p99 && p99 <= mx, s"$name percentile ordering")
      assert(skew === mx * 1000000L / p50, s"$name skew replay")
      // independent recount: the reported hot key really is an argmax
      // with the reported max multiplicity, and n_keys matches
      val counts = li.groupBy(col(name)).count()
      assert(counts.count() === nKeys, s"$name key cardinality")
      val hotCnt = counts.filter(col(name) === hot)
        .collect()(0).getLong(1)
      assert(hotCnt === mx, s"$name hot key carries max_rows")
      val maxCnt = counts.agg(max(col("count"))).collect()(0).getLong(0)
      assert(maxCnt === mx, s"$name max_rows is the true max")
      assert(counts.filter(col("count") === mx)
        .agg(min(col(name))).collect()(0).getLong(0) === hot,
        s"$name hot key is the min among ties")
    }
  }
}
