package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.Wap

/** Write–audit–publish: versioned promotion, pointer semantics, and
  * the quarantine path readers never observe. */
class WapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def root() =
    s"/tmp/graft_wap_spec_${java.util.UUID.randomUUID().toString.take(8)}"

  private val rules = Seq("v_non_negative" -> (col("v") >= 0))

  test("sequential valid publishes advance the pointer; readers see " +
    "exactly the latest version") {
    val r = root()
    val (ok1, rep1) = Wap.publish(Seq((1L, 10.0), (2L, 20.0))
      .toDF("id", "v"), r, rules)
    assert(ok1 && rep1.collect().forall(_.getBoolean(3)))
    assert(Wap.readPublished(spark, r).count() === 2)
    val (ok2, _) = Wap.publish(Seq((3L, 30.0)).toDF("id", "v"), r, rules)
    assert(ok2)
    val now = Wap.readPublished(spark, r).collect()
    assert(now.length === 1 && now.head.getLong(0) === 3L,
      "the pointer must resolve to v2's content")
  }

  test("a failed audit quarantines the batch and leaves the published " +
    "version untouched; the next valid batch reuses the version slot") {
    val r = root()
    assert(Wap.publish(Seq((1L, 1.0)).toDF("id", "v"), r, rules)._1)
    val (ok, report) = Wap.publish(Seq((9L, -5.0)).toDF("id", "v"),
      r, rules)
    assert(!ok)
    assert(report.filter(col("rule") === "v_non_negative")
      .collect().head.getLong(1) === 1L, "one violating row reported")
    val still = Wap.readPublished(spark, r).collect()
    assert(still.length === 1 && still.head.getLong(0) === 1L,
      "readers must never see the rejected batch")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(r, "_rejected_v2")),
      "the bad batch is quarantined, not deleted")
    assert(Wap.publish(Seq((7L, 7.0)).toDF("id", "v"), r, rules)._1)
    assert(Wap.readPublished(spark, r).collect().head.getLong(0) === 7L)
  }

  test("reading an empty root fails loudly rather than returning an " +
    "empty frame") {
    intercept[IllegalArgumentException] {
      Wap.readPublished(spark, root())
    }
  }

  test("streaming WAP: a bad micro-batch is quarantined while clean " +
    "batches publish, and a redelivered batch merges exactly-once") {
    import java.nio.file.Files
    import graft.streaming.StreamPipeline
    val tmp = Files.createTempDirectory(
      StreamPipeline.scratchRoot(), "graft_swap_")
    val inDir = tmp.resolve("in").toString
    val r = root()
    // three single-file micro-batches: clean, BAD (negative v), clean
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(inDir)
    Seq((3L, -3.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(inDir)
    Seq((4L, 4.0), (1L, 1.0)).toDF("id", "v") // id 1 redelivered
      .coalesce(1).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema("id BIGINT, v DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val out = StreamPipeline.streamWapPublish(spark, stream, r,
      rules = Seq[(String, org.apache.spark.sql.Column)](
        "v_non_negative" -> (col("v") >= 0)),
      keyCols = Seq("id"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    // the bad batch never published; the redelivered id merged once
    assert(out.toSeq === Seq((1L, 1.0), (2L, 2.0), (4L, 4.0)))
    // exactly the clean publishes appear in the history; the bad batch
    // is quarantined on disk, not silently dropped
    val vs = Wap.versions(spark, r)
    assert(vs.map(_._1) === vs.map(_._1).sorted && vs.count(_._2) === 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val rejected = fs.listStatus(new org.apache.hadoop.fs.Path(r))
      .map(_.getPath.getName).count(_.startsWith("_rejected"))
    assert(rejected === 1, "the bad batch must be quarantined")
  }

  test("time travel: a superseded version stays byte-intact, the " +
    "history lists it, and a missing version fails loudly") {
    import spark.implicits._
    val r = root()
    val rules = Seq[(String, org.apache.spark.sql.Column)](
      "v_non_negative" -> (col("v") >= 0))
    assert(Wap.publish(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      r, rules)._1)
    assert(Wap.publish(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "v"), r, rules)._1)
    assert(Wap.versions(spark, r) === Seq((1, false), (2, true)))
    // current points at v2...
    assert(Wap.readPublished(spark, r).count() === 3L)
    // ...but v1 reads back exactly as published
    val v1 = Wap.readVersion(spark, r, 1)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    assert(v1.toSeq === Seq((1L, 1.0), (2L, 2.0)))
    intercept[IllegalArgumentException] {
      Wap.readVersion(spark, r, 3)
    }
  }
}
