package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Persisted near-dup index LIFECYCLE (d15, round-8 VERDICT ask #5):
  * the io12 ledger pattern applied to d11's MinHash-LSH band index,
  * so continuous ingestion is one composed pipeline — init the index
  * from the seed corpus once, then every batch PROBES the index read
  * back from disk, exact-verifies its candidates against only the
  * candidate slice of the stored corpus text, and the survivors
  * UPDATE the store that the next batch probes. Batch N+1 therefore
  * rejects mutated re-deliveries of batch N's survivors — the
  * property that proves the index actually turned over (a per-call
  * rebuild, d11's harness shape, cannot distinguish a stale index).
  *
  * Store layout under `root`:
  *   - `root/index`  (band, bucket, doc_id) — B·20 B per doc, the
  *     only corpus-derived artifact a probe reads in full;
  *   - `root/texts`  (doc_id, text) — read ONLY via a candidate-id
  *     semi join (the verify leg is candidate-bounded, never a corpus
  *     scan; a lake that cannot afford text re-reads swaps in d13's
  *     signature-only verify, same lifecycle).
  *
  * Write ordering follows io12's commit-after-consume: survivors are
  * computed and MATERIALIZED first, then appended to the store — a
  * crash mid-ingest leaves the store exactly as the previous batch
  * committed it, and re-running the batch is idempotent at the store
  * level (the batch's band rows and texts land once per successful
  * run; re-delivered survivors of a half-failed run reject against
  * nothing and re-append, which downstream exact dedup absorbs).
  *
  * Verification is the d11 contract with the round-8 integer
  * discipline: exact character-5-shingle Jaccard, compared as
  * `10000·|∩| ≥ 7000·|∪|` in pure integers — no double division, no
  * rounding convention. Survivors collapse within-batch to the min-id
  * member per exact fingerprint (the d10 aggregate). */
object NearDupIndexStore {

  private def indexPath(root: String) = s"$root/index"
  private def textsPath(root: String) = s"$root/texts"

  /** The store's accepted corpus (doc_id, text) — what a streaming
    * composition publishes after every micro-batch ingests. */
  def publishedTexts(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(textsPath(root))

  /** Initialize the store from the seed corpus (overwrites). */
  def init(corpus: DataFrame, root: String, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, numHashes: Int = 16,
      bands: Int = 4): Unit = {
    Dedup.lshBandIndex(corpus, idCol, textCol, k, numHashes, bands)
      .write.mode("overwrite").parquet(indexPath(root))
    corpus.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(textsPath(root))
  }

  /** Ingest one batch against the PERSISTED store: probe the on-disk
    * band index, exact-verify candidates against the candidate slice
    * of the stored texts, collapse surviving exact twins, append the
    * survivors' band rows + texts to the store, and return the
    * survivors (idCol, textCol, fingerprint). */
  def ingest(spark: SparkSession, root: String, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 5,
      numHashes: Int = 16, bands: Int = 4,
      thresholdE4: Long = 7000L): DataFrame = {
    val index = spark.read.parquet(indexPath(root))
      .withColumnRenamed(idCol, "__corpus_id")
    // the batch is shingled ONCE and the arrays materialize with the
    // checkpoint: the probe leg, the verify leg, and the survivor
    // index append all reuse them (this method used to re-normalize +
    // re-shingle the batch three times — guide §1.2: don't recompute
    // what you already hold). Signatures/band rows are byte-identical
    // (same hash family over the same shingles).
    val inc = incoming
      .select(col(idCol), col(textCol),
        TextAnalysis.normalized(col(textCol)).as("__norm"))
      .select(col(idCol), col(textCol),
        Dedup.shinglesFromNorm(col("__norm"), k).as("__sh"))
      .localCheckpoint()
    val probes = Dedup.bandBuckets(
      Dedup.minhashFromShingles(inc, idCol, "__sh", numHashes),
      idCol, numHashes, bands)
    val cands = probes.join(index, Seq("band", "bucket"))
      .select(col(idCol), col("__corpus_id")).distinct()
    // candidate-bounded text re-read: semi join pushes the id set
    // into the store scan
    val corpusSh = spark.read.parquet(textsPath(root)).join(
        cands.select(col("__corpus_id").as(idCol)).distinct(),
        Seq(idCol), "left_semi")
      .select(col(idCol), TextAnalysis.normalized(col(textCol))
        .as("__norm"))
      .select(col(idCol).as("__corpus_id"),
        Dedup.shinglesFromNorm(col("__norm"), k).as("__sh_c"))
    val rejected = cands
      .join(inc.select(col(idCol), col("__sh").as("__sh_i")), Seq(idCol))
      .join(corpusSh, Seq("__corpus_id"))
      .filter(size(array_intersect(col("__sh_i"), col("__sh_c")))
        .cast("long") * 10000L >=
        size(array_union(col("__sh_i"), col("__sh_c")))
          .cast("long") * thresholdE4)
      .select(col(idCol)).distinct()
    val survivors = inc
      .join(rejected, Seq(idCol), "left_anti")
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col(idCol))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(textCol), col("fingerprint"), col("__sh"))
      .localCheckpoint() // consume durably BEFORE the store update
    Dedup.bandBuckets(
      Dedup.minhashFromShingles(survivors, idCol, "__sh", numHashes),
      idCol, numHashes, bands)
      .write.mode("append").parquet(indexPath(root))
    survivors.select(col(idCol), col(textCol))
      .write.mode("append").parquet(textsPath(root))
    survivors.select(col(idCol), col(textCol), col("fingerprint"))
  }
}
