package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.NearDupIndexStore
import graft.streaming.StreamPipeline

/** Streaming near-dup dedup (s16): redelivered and
  * mutated-redelivered docs collapse exactly once ACROSS
  * micro-batches, and a second stream run over the same source
  * (the crash/replay shape) publishes nothing twice. */
class StreamNearDupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog " +
    "while the calm river runs past the old stone bridge at dawn"
  private val b = "columnar engines scan parquet files with " +
    "vectorized readers and push filters into row group footers"
  private val c = "unrelated sourdough baking with a slow cold " +
    "overnight fermentation and a very hot dutch oven finish"

  /** Write each batch as one stream file, mod-times forcing order. */
  private def streamDir(batches: Seq[Seq[(Long, String)]]): String = {
    val dir = Files.createTempDirectory("graft_snd_src")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = dir.resolve(s"_build_$i")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = dir.resolve(s"half_$i.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    dir.toString
  }

  private def run(src: String, store: String) = {
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamPipeline.streamNearDupDedup(spark, stream, store)
  }

  test("batch 2's exact and mutated re-deliveries of batch 1 docs " +
    "reject against the index batch 1 committed; fresh docs land") {
    val src = streamDir(Seq(
      Seq((1L, a), (2L, b)),
      Seq((10L, a),              // exact redelivery of 1
        (11L, b + " zt11x"),     // mutated redelivery of 2
        (12L, c))))              // fresh
    val store = Files.createTempDirectory("graft_snd_store").toString
    NearDupIndexStore.init(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), store)
    val out = run(src, store)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 12L),
      s"exactly-once across micro-batches violated: ${out.toSeq}")
  }

  test("re-running the whole stream over the same source (crash/" +
    "replay) publishes nothing twice — every doc now rejects " +
    "against its own stored copy") {
    val src = streamDir(Seq(Seq((1L, a)), Seq((2L, b), (3L, a))))
    val store = Files.createTempDirectory("graft_snd_store2").toString
    NearDupIndexStore.init(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), store)
    val first = run(src, store).select("doc_id").as[Long]
      .collect().sorted
    assert(first.toSeq === Seq(1L, 2L),
      "doc 3 (exact dup of 1, later batch) must not publish")
    // fresh checkpoint, same source, same store — the at-least-once
    // replay path: published corpus must be unchanged
    val again = run(src, store).select("doc_id").as[Long]
      .collect().sorted
    assert(again.toSeq === Seq(1L, 2L),
      "replay must not double-publish or re-append store rows")
    assert(NearDupIndexStore.publishedTexts(spark, store).count() === 2)
  }
}
