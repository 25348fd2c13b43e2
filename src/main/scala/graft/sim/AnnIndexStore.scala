package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted ANN index LIFECYCLE (sim14, round-9 VERDICT ask #6) —
  * d15's store pattern applied to vectors: train the coarse quantizer
  * ONCE on the seed corpus and persist it, then every batch assigns
  * its vectors against the centroids READ FROM DISK and appends to the
  * inverted lists; queries probe the store as it exists on disk. This
  * is how production IVF indexes actually run (FAISS's
  * `train` / `add` / `search` split): the quantizer is frozen at train
  * time — lists grow, centroids don't move — so an assignment made at
  * ingest time stays valid forever and batches never retrain.
  *
  * The quantizer is the sim11 deterministic label-centroid recipe
  * (per-label per-dim 6-dp mean, 4-dp-cosine argmax with label-asc
  * tie-break) rather than the xxhash-seeded k-means of sim7: every
  * step is engine-replayable, which is what lets the WHOLE lifecycle —
  * seed-trained centroids, two appended batches, the final probe —
  * hash-check against a DuckDB oracle that recomputes it from the raw
  * table (the d15 discipline: a green row certifies the store's
  * contents, not just the probe code).
  *
  * Store layout under `root`:
  *   - `root/centroids` (cl, centroid DOUBLE[]) — |labels| rows,
  *     written once by [[init]], read (and broadcast) by every
  *     append/search;
  *   - `root/vectors` (vec_id, vec DOUBLE[], cell) — the inverted
  *     lists; appends are io12 commit-after-consume (the batch's
  *     assignment materializes via localCheckpoint BEFORE the store
  *     append, so a crash mid-ingest leaves the lists exactly as the
  *     previous batch committed them).
  *
  * Scale: centroids are metadata-sized and broadcast; a batch append
  * touches only the batch (one broadcast join, no corpus shuffle); a
  * search reads only the probed cells' lists — with partition-by-cell
  * list files this is the standard |corpus|·probes/nlist read, and
  * the top-k runs through [[Similarity.topKPerQuery]]'s salted
  * two-phase window. */
object AnnIndexStore {

  private def centsPath(root: String) = s"$root/centroids"
  private def vecsPath(root: String) = s"$root/vectors"

  import Similarity.{toDouble, cosine, dot, norm}

  /** Per-label 6-dp mean centroids — the d12/sim11 deterministic
    * quantizer, trained on the SEED corpus only. */
  private def train(seed: DataFrame, vecCol: String,
      labelCol: String): DataFrame =
    seed.select(col(labelCol).as("cl"), posexplode(col(vecCol)))
      .groupBy(col("cl"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("dim_avg"))
      .groupBy(col("cl"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
        x => x.getField("dim_avg")).as("centroid"))

  /** Nearest-centroid cell per vector: 4-dp cosine argmax, label-asc
    * tie-break — identical to the oracle's rn=1 pick. */
  private def assign(vecs: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("vec"))
      .join(broadcast(cents))
      .withColumn("csim",
        round(cosine(col("vec"), col("centroid")), 4))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cl"),
          struct(col("csim"), (-col("cl")).as("neg"))).as("cell"),
        first(col("vec")).as("vec"))
      .select(col("vec_id"), col("vec"), col("cell"))

  /** Train the quantizer on the seed and initialize the store
    * (overwrites both artifacts). */
  def init(seed: DataFrame, root: String, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): Unit = {
    val cents = train(seed, vecCol, labelCol)
    cents.write.mode("overwrite").parquet(centsPath(root))
    assign(seed, cents, idCol, vecCol)
      .write.mode("overwrite").parquet(vecsPath(root))
  }

  /** The frozen quantizer as persisted. */
  def centroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(centsPath(root))

  /** The inverted lists as persisted (vec_id, vec, cell). */
  def vectors(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(vecsPath(root))

  /** Assign one batch against the PERSISTED centroids and append to
    * the lists; returns the batch's assignment. The quantizer is
    * frozen — append never retrains. */
  def append(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(batch, centroids(spark, root), idCol, vecCol)
      .localCheckpoint() // consume durably BEFORE the store update
    assigned.write.mode("append").parquet(vecsPath(root))
    assigned
  }

  /** Probe the store as persisted: each query searches its `probes`
    * nearest centroids' lists; returns (query_id, rank, corpus_id,
    * sim) top-k rows. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      k: Int = 5, probes: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(spark, root)
    val q = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val probed = q.join(broadcast(cents))
      .withColumn("psim",
        round(cosine(col("qvec"), col("centroid")), 4))
      .withColumn("pr", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(desc("psim"), col("cl"))))
      .filter(col("pr") <= probes)
      .select(col("query_id"), col("qvec"), col("qnorm"),
        col("cl").as("cell"))
    val scored = vectors(spark, root)
      .withColumnRenamed("vec_id", "corpus_id")
      .join(probed, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cnorm", norm(col("vec")))
      .withColumn("sim", round(
        dot(col("vec"), col("qvec")) / (col("cnorm") * col("qnorm")),
        4))
    Similarity.topKPerQuery(scored, k)
  }
}
