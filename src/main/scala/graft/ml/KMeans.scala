package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means (x65) — the full Lloyd loop that
  * x4 (centroid build) and x10 (assignment step) are the pieces of,
  * and the clustering d12's SemDeDup consumes: a FIXED iteration
  * count from given initial centroids, so both engines reach
  * bit-identical states (the g1/ml7 iterative-parity discipline
  * applied to clustering — no RNG, no convergence-epsilon races).
  *
  * Per iteration: (1) assignment = the x10 broadcast argmax (cosine
  * rounded 4 dp, (sim desc, label asc) tie-break — nothing ever sorts
  * the corpus), (2) update = per-cluster per-dimension mean rounded
  * 6 dp (one posexplode + hash aggregate; the k×dims table re-
  * broadcasts next round). Clusters that lose every member vanish —
  * deterministically in both engines (plain inner aggregates).
  *
  * Scale: each iteration is one corpus scan under a k×dims broadcast
  * + one partial-aggregatable shuffle keyed by (cluster, dim); driver
  * state is nothing (the loop is fixed-length, no convergence reads).
  * At 100 TB this is exactly MLlib's dense k-means shape minus its
  * RNG init — init here is the deterministic per-label mean, the
  * "continue training from labels" warm start. */
object KMeans {

  /** Run `iters` Lloyd iterations. `vecs`: (idCol, vec array<double>);
    * `initCentroids`: (label, centroid array<double>). Returns the
    * long-form result — one row per (cluster, pos): final dim mean +
    * the size of the assignment that produced it. */
  def lloyd(vecs: DataFrame, initCentroids: DataFrame, iters: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    var centroids = initCentroids
    var lastAssign: DataFrame = null
    for (_ <- 1 to iters) {
      lastAssign = graft.dedup.SemDedup.assign(vecs, centroids, idCol)
      centroids = lastAssign
        .join(vecs, Seq(idCol))
        .select(col("cluster").as("label"), posexplode(col("vec")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col")), 6).as("dim_avg"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
          x => x.getField("dim_avg")).as("centroid"))
        .localCheckpoint()
    }
    val sizes = lastAssign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    centroids
      .select(col("label").as("cluster"),
        posexplode(col("centroid")).as(Seq("pos", "dim_avg")))
      .join(sizes, Seq("cluster"))
      .select(col("cluster"), col("n_members"),
        col("pos").cast("long").as("pos"), col("dim_avg"))
  }

  /** DuckDB twin of [[lloyd]] over `embeddings` with per-label-mean
    * init: the same iterations statically unrolled as CTEs (the
    * g1/irlsSql pattern — assignment as a row_number argmax, update as
    * the identical rounded mean). */
  def lloydSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""s$t AS (SELECT vec_id, c.label,
         |    round(list_cosine_similarity(v.vec, c.centroid), 4) AS sim
         |  FROM v, c$p c),
         |a$t AS (SELECT vec_id, label AS cluster FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sim DESC, label) AS rnk FROM s$t)
         |  WHERE rnk = 1),
         |x$t AS (SELECT a.cluster AS label,
         |    generate_subscripts(v.vec, 1) - 1 AS pos,
         |    unnest(v.vec) AS val
         |  FROM a$t a JOIN v USING (vec_id)),
         |d$t AS (SELECT label, pos, round(avg(val), 6) AS dim_avg
         |  FROM x$t GROUP BY 1, 2),
         |c$t AS (SELECT label, list(dim_avg ORDER BY pos) AS centroid
         |  FROM d$t GROUP BY label)""".stripMargin
    }
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings),
       |e0 AS (SELECT label, generate_subscripts(embedding, 1) - 1
       |    AS pos, unnest(embedding) AS val
       |  FROM embeddings),
       |d0 AS (SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6)
       |    AS dim_avg
       |  FROM e0 GROUP BY 1, 2),
       |c0 AS (SELECT label, list(dim_avg ORDER BY pos) AS centroid
       |  FROM d0 GROUP BY label),
       |${steps.mkString(", ")},
       |sz AS (SELECT cluster, count(*) AS n_members FROM a$iters
       |  GROUP BY 1)
       |SELECT d.label AS cluster, sz.n_members, d.pos, d.dim_avg
       |FROM d$iters d JOIN sz ON sz.cluster = d.label
       |ORDER BY cluster, pos""".stripMargin.replace('\n', ' ')
  }
}
