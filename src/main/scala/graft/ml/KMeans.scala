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
    // eager release runs TWO generations back: lastAssign is lazy and
    // references the previous round's centroids until the post-loop
    // `sizes` aggregate materializes, so only generation i-2 is
    // provably dead inside round i (see Checkpoints.free)
    var prevPrev: DataFrame = null
    for (_ <- 1 to iters) {
      lastAssign = graft.dedup.SemDedup.assign(vecs, centroids, idCol)
      // never free the caller's initCentroids — only rounds we made
      if ((prevPrev ne null) && (prevPrev ne initCentroids))
        graft.util.Checkpoints.free(prevPrev)
      prevPrev = centroids
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

  /** Simplified silhouette (x66) — the clustering-quality eval that
    * ships with every k-means (sklearn's `silhouette` on the
    * centroid approximation): per vector, a = cosine distance to its
    * OWN centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a) / max(a, b); reported as per-cluster mean + size.
    * The centroid approximation is what makes it a SCALE metric: the
    * exact silhouette is all-pairs (corpus²); this one is one corpus
    * scan under the k×dims broadcast — the same cost as an assignment
    * step — plus two partial-aggregatable reductions, no window over
    * the corpus anywhere.
    *
    * Determinism: sims round to 4 dp (the x10 contract); the assigned
    * centroid is the (sim desc, label asc) argmax; b excludes the
    * assigned LABEL (not equal sims) so ties cannot flip membership
    * of the b-set; per-row s rounds to 4 dp and averages through a
    * DECIMAL sum. Duplicate-centroid degeneracy (second_sim = 1)
    * yields NULL rather than ±Inf, mirrored in the twin. */
  def simplifiedSilhouette(vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    val scored = vecs.join(broadcast(centroids))
      .select(col(idCol), col("label"),
        round(graft.sim.Similarity.cosine(col("vec"), col("centroid")),
          4).as("sim"))
    val best = scored.groupBy(col(idCol))
      .agg(max_by(struct(col("label"), col("sim")),
        struct(col("sim"), (-col("label")).as("neg_label"))).as("b"))
      .select(col(idCol), col("b.label").as("cluster"),
        col("b.sim").as("best_sim"))
    val second = scored.join(best, Seq(idCol))
      .filter(col("label") =!= col("cluster"))
      .groupBy(col(idCol))
      .agg(max(col("sim")).as("second_sim"))
    val s = best.join(second, Seq(idCol))
      .withColumn("sil", when(col("second_sim") < 1, round(
        (col("best_sim") - col("second_sim")) /
          (lit(1.0) - col("second_sim")), 4)))
    s.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("sil").cast("decimal(18,4)")).cast("double") /
          count(col("sil")), 4).as("avg_silhouette"))
  }

  /** DuckDB twin of [[simplifiedSilhouette]] over `embeddings` with
    * per-label-mean centroids. */
  def silhouetteSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings),
       |e0 AS (SELECT label, generate_subscripts(embedding, 1) - 1
       |    AS pos, unnest(embedding) AS val FROM embeddings),
       |d0 AS (SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6)
       |    AS dim_avg FROM e0 GROUP BY 1, 2),
       |c0 AS (SELECT label, list(dim_avg ORDER BY pos) AS centroid
       |  FROM d0 GROUP BY label),
       |scored AS (SELECT vec_id, c.label,
       |    round(list_cosine_similarity(v.vec, c.centroid), 4) AS sim
       |  FROM v, c0 c),
       |best AS (SELECT vec_id, label AS cluster, sim AS best_sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, label) AS rnk FROM scored)
       |  WHERE rnk = 1),
       |snd AS (SELECT s.vec_id, max(s.sim) AS second_sim
       |  FROM scored s JOIN best b ON b.vec_id = s.vec_id
       |    AND s.label <> b.cluster
       |  GROUP BY 1),
       |sil AS (SELECT b.vec_id, b.cluster,
       |    CASE WHEN second_sim < 1 THEN
       |      round((best_sim - second_sim) /
       |        (CAST('1' AS DOUBLE) - second_sim), 4) END AS sil
       |  FROM best b JOIN snd USING (vec_id))
       |SELECT cluster, count(*) AS n_members,
       |  round(CAST(sum(CAST(sil AS DECIMAL(18,4))) AS DOUBLE)
       |    / count(sil), 4) AS avg_silhouette
       |FROM sil GROUP BY cluster ORDER BY cluster"""
      .stripMargin.replace('\n', ' ')

  /** DuckDB twin of [[lloyd]] over `embeddings` with per-label-mean
    * init: the same iterations statically unrolled as CTEs (the
    * g1/irlsSql pattern — assignment as a row_number argmax, update as
    * the identical rounded mean). */
  /** Deterministic farthest-point (maximin) seeding (ml23) — the
    * k-means++-style init that picks spread-out centers instead of
    * x65's warm-start-from-labels: seed with the lowest-id vector,
    * then k−1 times pick the vector LEAST similar to its nearest
    * already-chosen center (argmin of max cosine, ties to the
    * smallest id). The classic ++ algorithm draws D²-weighted RANDOM
    * seeds; the maximin variant is its deterministic limit — same
    * spread guarantee, no RNG, so both engines replay it exactly.
    *
    * Scale: each round is ONE corpus scan under a ≤k-row broadcast
    * plus a TakeOrdered top-1 — k·scan total, nothing corpus-sized
    * sorts or collects. Determinism: cosines round to 4 dp (the
    * x10/x65 contract), per-point max over the chosen set is exact on
    * those 4 dp values, and the argmin tie-breaks by id. */
  def maximinInit(vecs: DataFrame, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    var chosen = vecs.orderBy(col(idCol)).limit(1)
      .select(lit(1).as("seed_rank"), col(idCol).as("seed_id"),
        col("vec").as("cvec"),
        lit(null).cast("double").as("max_sim"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val next = vecs
        .join(broadcast(chosen.select(col("cvec"))))
        .withColumn("sim",
          round(graft.sim.Similarity.cosine(col("vec"), col("cvec")), 4))
        .groupBy(col(idCol))
        .agg(max(col("sim")).as("max_sim"))
        .join(vecs, Seq(idCol))
        .orderBy(col("max_sim"), col(idCol)).limit(1)
        .select(lit(r).as("seed_rank"), col(idCol).as("seed_id"),
          col("vec").as("cvec"), col("max_sim"))
      val grown = chosen.unionAll(next).localCheckpoint()
      graft.util.Checkpoints.free(chosen) // superseded round (eager)
      chosen = grown
    }
    chosen.select(col("seed_rank"), col("seed_id"), col("max_sim"))
      .orderBy("seed_rank")
  }

  /** DuckDB twin of [[maximinInit]] over `embeddings` (k unrolled). */
  def maximinInitSql(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = (1 until r).map(i => s"SELECT vec FROM p$i")
        .mkString(" UNION ALL ")
      s"""m$r AS (SELECT v.vec_id,
         |    max(round(list_cosine_similarity(v.vec, c.vec), 4)) AS ms
         |  FROM v, ($prev) c GROUP BY 1),
         |p$r AS (SELECT m$r.vec_id, v.vec, ms
         |  FROM m$r JOIN v USING (vec_id)
         |  ORDER BY ms, vec_id LIMIT 1)""".stripMargin
    }
    val out = (s"SELECT CAST(1 AS INT) AS seed_rank, vec_id AS seed_id, " +
      "CAST(NULL AS DOUBLE) AS max_sim FROM p1") +:
      (2 to k).map(r =>
        s"SELECT CAST($r AS INT), vec_id, ms FROM p$r")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings),
       |p1 AS (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 1),
       |${rounds.mkString(", ")}
       |${out.mkString(" UNION ALL ")}
       |ORDER BY seed_rank""".stripMargin.replace('\n', ' ')
  }

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
