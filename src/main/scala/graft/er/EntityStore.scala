package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental entity resolution against a PERSISTED golden-record
  * store (er9) — the production shape the batch er1–er8 family stops
  * short of: records arrive in batches, each batch resolves against
  * the entities known SO FAR, matched records adopt the stored
  * entity's id, unmatched records found new entities that later
  * batches can match. The io12/d15 lifecycle applied to identity:
  * the store is the only state that persists or grows.
  *
  * Matching is er2's machinery unchanged: positional blocking key
  * (the name's digit zone — prefix typos never touch it), integer
  * levenshtein ≤ 1 within the block, best match = min (distance,
  * entity_id). No scores to round, nothing probabilistic — which is
  * what makes a sequential replay oracle-expressible.
  *
  * Scale: per batch the moving parts are the batch's rows and the
  * BLOCK-joined candidate slice of the store — the store never
  * re-matches itself, and the append is new-entity-sized. Blocking
  * bounds candidate fan-out exactly as in er1–er8.
  *
  * Convention (pinned by spec + oracle): records in one batch match
  * only against the PRE-batch store — two mutually-near records
  * arriving together found two entities (the standard batch-then-
  * merge caveat; er8's CC pass is the merge tool). Redelivered
  * records match their own stored entity at distance 0 and create
  * nothing. */
object EntityStore {

  private def path(root: String) = s"$root/entities"

  /** The resolved entity registry (entity_id, name). */
  def entities(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(path(root))

  /** Initialize (overwrite) the store from seed records. */
  def init(seed: DataFrame, root: String): Unit =
    seed.select(col("entity_id"), col("name"))
      .write.mode("overwrite").parquet(path(root))

  /** Resolve one batch against the current store, append the new
    * entities, and return the resolution
    * (record_id, name, entity_id, is_new). */
  def ingest(spark: SparkSession, root: String,
      batch: DataFrame): DataFrame = {
    val store = entities(spark, root)
      .select(col("entity_id"), col("name").as("entity_name"))
    val matched = batch
      .join(store,
        substring(col("name"), 12, 5) ===
          substring(col("entity_name"), 12, 5) &&
          levenshtein(col("name"), col("entity_name")) <= 1,
        "left")
      .groupBy(col("record_id"), col("name"))
      .agg(min_by(col("entity_id"),
        struct(levenshtein(col("name"), col("entity_name")),
          col("entity_id"))).as("matched_id"))
    val resolved = matched.select(col("record_id"), col("name"),
      coalesce(col("matched_id"), col("record_id")).as("entity_id"),
      col("matched_id").isNull.as("is_new"))
    // persist the resolution to IMMUTABLE storage before growing the
    // store: appending to the entities path invalidates any cached
    // plan that read it (Spark refreshes path-dependent caches on
    // write), so a merely-cached resolution would silently recompute
    // against the post-batch store — the resolution log also being
    // durable is what a production lineage audit wants anyway
    val outPath = s"$root/resolutions/${java.util.UUID.randomUUID()
      .toString.take(8)}"
    resolved.write.parquet(outPath)
    val frozen = spark.read.parquet(outPath)
    frozen.filter(col("is_new"))
      .select(col("entity_id"), col("name"))
      .write.mode("append").parquet(path(root))
    frozen
  }
}
