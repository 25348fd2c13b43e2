package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.IncrementalLedger

/** Incremental file-ledger ingestion on a real temp directory. */
class LedgerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each run reads only what landed since the last commit; a run " +
    "with nothing new is a no-op; the ledger persists on disk") {
    val root = Files.createTempDirectory("graft_ledger").toString
    val src = s"$root/src"
    val ledger = s"$root/ledger"

    (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .repartition(2).write.mode("overwrite").parquet(src)
    val files1 = IncrementalLedger.listDataFiles(spark, src)
    assert(files1.size === 2)

    val b1 = IncrementalLedger.processNew(spark, src, ledger, 1L)
    assert(b1.isDefined && b1.get.df.count() === 10)
    // crash-before-commit: the batch is re-presented, not lost
    assert(IncrementalLedger.processNew(spark, src, ledger, 1L)
      .get.paths === b1.get.paths,
      "uncommitted batch must surface again (at-least-once)")
    b1.get.commit()

    // second feed batch lands as appended files
    (11 to 15).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .repartition(1).write.mode("append").parquet(src)
    val nf = IncrementalLedger.newFiles(spark, src, ledger)
    assert(nf.size === 1, "only the appended file is new")
    assert(!files1.exists(nf.contains), "batch-1 files are not re-read")

    val b2 = IncrementalLedger.processNew(spark, src, ledger, 2L)
    assert(b2.get.df.count() === 5)
    assert(b2.get.df.select("id").as[Long].collect().toSet ===
      (11L to 15L).toSet, "run 2 content is exactly batch 2")
    b2.get.commit()

    // no-op third run; ledger state is read back from disk each time
    assert(IncrementalLedger.processNew(spark, src, ledger, 3L).isEmpty)
    assert(IncrementalLedger.processedPaths(spark, ledger).size === 3)
  }

  test("an empty or missing source directory yields no files and no " +
    "batch") {
    val root = Files.createTempDirectory("graft_ledger_e").toString
    assert(IncrementalLedger.listDataFiles(spark,
      s"$root/nope").isEmpty)
    assert(IncrementalLedger.processNew(spark, s"$root/nope",
      s"$root/ledger", 1L).isEmpty)
  }
}
