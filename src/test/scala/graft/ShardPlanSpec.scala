package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Training-shard planner (mm8): hand-computed start-offset
  * assignment on planted sizes, and manifest invariants on real data
  * — contiguous id ranges, conservation of items and bytes,
  * consecutive shard ids, byte-window replay. */
class ShardPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("start-offset rule on planted sizes (blob straddling a " +
    "boundary stays in the shard its first byte lands in)") {
    import spark.implicits._
    // sizes 10,10,10 with target 16: start offsets 0,10,20 → shards
    // 0,0,1 — the second blob STRADDLES byte 16 but belongs to shard 0
    val blobs = Seq((1L, 10L), (2L, 10L), (3L, 10L))
      .toDF("doc_id", "bytes")
    val out = graft.etl.Ids.keyedCumsum(
      blobs.withColumn("__k", lit(0)), "__k", Seq("doc_id"),
      "bytes", "cum_bytes")
      .withColumn("shard_id", expr("(cum_bytes - bytes) div 16"))
      .select(col("doc_id"), col("shard_id"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("manifest invariants on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("mm8_shard_plan")(spark, dir)
      .collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "item conservation")
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.indices.map(_.toLong), "consecutive shard ids from 0")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(4) < b.getLong(3),
          "shards are contiguous, disjoint doc_id ranges")
      case _ =>
    }
    // byte-window replay: each shard's start offset maps to its id
    var offset = 0L
    rows.foreach { r =>
      assert(offset / 16384L === r.getLong(0), "start-offset replay")
      offset += r.getLong(2)
    }
    // every shard but the last reaches past its window start by
    // construction; sizes stay within one max-blob of the target
    val maxBytes = rows.map(_.getLong(2)).max
    assert(maxBytes < 16384L * 2, "no shard runs away")
  }
}
