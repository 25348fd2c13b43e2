package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.NearDupIndexStore

/** Persisted near-dup index lifecycle (d15) on controlled fixtures:
  * init → probe → update → probe again, with the cross-batch
  * rejection that only an actually-updated index can produce. */
class NearDupStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seedText = "the quick brown fox jumps over the lazy " +
    "dog while the calm river runs past the old stone bridge at dawn"
  private val freshText = "columnar engines scan parquet files with " +
    "vectorized readers and push filters into the row group footers"
  private val otherText = "completely unrelated content about baking " +
    "sourdough bread with a slow overnight cold fermentation process"

  test("batch 1 rejects a seed near-dup and accepts fresh text; " +
    "batch 2 rejects a mutated re-delivery of batch 1's OWN survivor " +
    "(the persisted index turned over); exact twins collapse min-id") {
    val root = Files.createTempDirectory("graft_ndstore").toString
    NearDupIndexStore.init(
      Seq((1L, seedText)).toDF("doc_id", "text"), root)
    val batch1 = Seq(
      (10L, freshText),                    // fresh — survives
      (11L, seedText + " zq11x"),          // seed mutant — rejected
      (12L, otherText), (13L, otherText)   // exact twins — min-id kept
    ).toDF("doc_id", "text")
    val s1 = NearDupIndexStore.ingest(spark, root, batch1)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq === Seq(10L, 12L))
    val batch2 = Seq(
      (20L, freshText + " zr20x"),         // batch-1 survivor mutant
      (21L, otherText + " zr21x"),         // batch-1 survivor mutant
      (22L, seedText + " zs22x")           // seed mutant (2 updates on)
    ).toDF("doc_id", "text")
    val s2 = NearDupIndexStore.ingest(spark, root, batch2)
      .select("doc_id").as[Long].collect()
    assert(s2.isEmpty,
      "every batch-2 doc near-dups something already in the store")
  }

  test("re-ingesting the same batch after a crash-window re-delivery " +
    "rejects everything (store-level idempotence)") {
    val root = Files.createTempDirectory("graft_ndstore2").toString
    NearDupIndexStore.init(
      Seq((1L, seedText)).toDF("doc_id", "text"), root)
    val batch = Seq((10L, freshText)).toDF("doc_id", "text")
    val first = NearDupIndexStore.ingest(spark, root, batch)
    assert(first.count() === 1)
    val again = NearDupIndexStore.ingest(spark, root, batch)
    assert(again.count() === 0,
      "an exact re-delivery collides on every band (Jaccard 1)")
    // the store grew by exactly one text row across both ingests
    assert(spark.read.parquet(s"$root/texts").count() === 2)
  }

  test("the verify leg reads only candidate texts (semi join), and a " +
    "non-colliding batch touches no stored text at all") {
    val root = Files.createTempDirectory("graft_ndstore3").toString
    NearDupIndexStore.init(
      Seq((1L, seedText)).toDF("doc_id", "text"), root)
    val out = NearDupIndexStore.ingest(spark, root,
      Seq((30L, otherText)).toDF("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(30L))
  }
}
