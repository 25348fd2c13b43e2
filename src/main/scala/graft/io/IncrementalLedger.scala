package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental file-ledger ingestion (io12) — the "process only what
  * landed since last run" pattern every continuously-fed lake needs
  * when the feed is plain files rather than a table format: a LEDGER
  * of already-processed file paths persists between runs; each run
  * lists the source directory, anti-joins the ledger, reads ONLY the
  * new files, and commits their paths with a batch id. Exactly the
  * manual half of what Auto-Loader / Iceberg incremental scan
  * automate — and the file-level sibling of d10's row-level
  * incremental index.
  *
  * Scale: the ledger is |files|-sized metadata (a 100 TB lake at 1 GB
  * files is ~1e5 rows — broadcastable); the listing is one namenode /
  * object-store LIST; data reads touch only the new batch. Listing
  * runs driver-side (it is metadata, like ZoneMap's footer pass).
  * Idempotence: [[processNew]] returns the batch UNCOMMITTED — the
  * caller consumes it durably (sink write, downstream materialize)
  * and THEN calls [[PendingBatch.commit]], so a crash anywhere before
  * the commit re-processes the batch (at-least-once — the
  * Auto-Loader/checkpoint ordering); pair with an idempotent sink
  * (x16 / io9 MERGE-style) for exactly-once. Committing before the
  * sink would silently drop the batch on a post-read failure
  * (at-most-once) — the round-7 advisor finding this ordering
  * fixes. */
object IncrementalLedger {

  /** Data files (part-*.parquet) under `dir`, sorted for determinism. */
  def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")
        && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.getPath).sorted
  }

  /** Paths already committed to the ledger (empty set if none). */
  def processedPaths(spark: SparkSession, ledger: String): Set[String] = {
    val p = new Path(ledger)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(ledger).select("path")
      .collect().map(_.getString(0)).toSet
  }

  /** Files under `dir` not yet in the ledger — the next batch. */
  def newFiles(spark: SparkSession, dir: String,
      ledger: String): Seq[String] = {
    val done = processedPaths(spark, ledger)
    listDataFiles(spark, dir).filterNot(done)
  }

  /** Record `batch` as processed under the given batch id. */
  def commit(spark: SparkSession, ledger: String, batch: Seq[String],
      batchId: Long): Unit = {
    if (batch.nonEmpty) {
      import spark.implicits._
      batch.map(p => (p, batchId)).toDF("path", "batch_id")
        .coalesce(1)
        .write.mode("append").parquet(ledger)
    }
  }

  /** An uncommitted incremental batch: `df` reads only the new files;
    * call [[commit]] AFTER the batch is durably consumed. */
  final case class PendingBatch(df: DataFrame, paths: Seq[String],
      ledger: String, batchId: Long) {
    def commit(): Unit =
      IncrementalLedger.commit(df.sparkSession, ledger, paths, batchId)
  }

  /** One incremental run: read only the new files (empty-schema-safe)
    * and return them as an UNCOMMITTED [[PendingBatch]] (None if
    * nothing landed). The caller commits after its sink succeeds —
    * commit-after-consume is what makes the crash window
    * at-least-once instead of data-loss. */
  def processNew(spark: SparkSession, dir: String, ledger: String,
      batchId: Long): Option[PendingBatch] = {
    val batch = newFiles(spark, dir, ledger)
    if (batch.isEmpty) None
    else Some(PendingBatch(spark.read.parquet(batch: _*), batch,
      ledger, batchId))
  }
}
