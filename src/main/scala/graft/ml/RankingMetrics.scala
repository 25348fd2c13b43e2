package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranking/retrieval evaluation (ml27): NDCG@k over a ranked result
  * list with binary label-match relevance — the offline eval every
  * vector-search / recommender change ships against. sim11 measures
  * RECALL (did the truth make the list); NDCG scores ORDER (did the
  * relevant results rank first), which is what users see.
  *
  * Determinism: the position discounts 1/log₂(r+1) are constants of
  * the METRIC, not the data — they embed as precomputed e6 integer
  * literals (the dq9 Benford discipline) in both engines, so DCG is
  * an exact integer dot product of (0/1 relevance)·(literal weight),
  * IDCG@k for binary relevance is a literal cumulative-weight lookup
  * on min(n_relevant_total, k), and ndcg_e6 is one truncating
  * division of non-negative integers. No doubles anywhere.
  *
  * Scale: the ranked list is |queries|·k rows; relevance needs one
  * (label → count) aggregate over the corpus (broadcastable) plus a
  * label join on the ranked rows — eval cost is noise next to the
  * retrieval it measures. */
object RankingMetrics {

  /** e6 integer discount weights w_r = round(10⁶ / log₂(r+1)). */
  private def w(r: Int): Long =
    math.round(1000000.0 / (math.log(r + 1) / math.log(2.0)))

  private def cumW(n: Int): Long = (1 to n).map(w).sum

  /** NDCG@k per query over `ranked` (query_id, rank, corpus_id) with
    * binary relevance = (corpus label == query label). `labels` maps
    * (vec_id, label); n_rel_total counts same-label corpus vectors
    * EXCLUDING the query itself (matching the ranked list's
    * self-exclusion). */
  def ndcgAtK(ranked: DataFrame, labels: DataFrame, k: Int)
      : DataFrame = {
    val lab = labels.select(col("vec_id"), col("label"))
    val labCounts = lab.groupBy(col("label"))
      .agg(count(lit(1)).as("n_label"))
    val dcgExpr = (1 to k).map(r =>
      s"CASE WHEN rank = $r AND rel = 1 THEN ${w(r)} ELSE 0 END")
      .mkString(" + ")
    val idcgExpr = "CASE " + (1 to k).map(r =>
      s"WHEN n_rel_total >= $r THEN ${cumW(math.min(r, k))}")
      .reverse.mkString(" ") + " END"
    // NDCG@k scores the TOP k only: cap the rank here rather than
    // trusting callers to pre-truncate — an uncapped list would
    // inflate n_rel_topk past what the rank-capped DCG counts
    val scored = ranked
      .filter(col("rank") <= k)
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("q_label")), Seq("query_id"))
      .join(lab.select(col("vec_id").as("corpus_id"),
        col("label").as("c_label")), Seq("corpus_id"))
      .withColumn("rel",
        when(col("q_label") === col("c_label"), 1L).otherwise(0L))
    scored.groupBy(col("query_id"), col("q_label"))
      .agg(sum(col("rel")).as("n_rel_topk"),
        sum(expr(dcgExpr)).as("dcg_e6"))
      .join(broadcast(labCounts
        .select(col("label").as("q_label"), col("n_label"))),
        Seq("q_label"))
      // same-label corpus size minus the query itself
      .withColumn("n_rel_total", col("n_label") - 1)
      .withColumn("idcg_e6", expr(idcgExpr))
      .select(col("query_id"), col("n_rel_topk").cast("long"),
        col("n_rel_total").cast("long"),
        col("dcg_e6").cast("long"), col("idcg_e6").cast("long"),
        expr("CASE WHEN idcg_e6 > 0 THEN " +
          "CAST((dcg_e6 * 1000000) div idcg_e6 AS BIGINT) END")
          .as("ndcg_e6"))
      .orderBy("query_id")
  }

  /** DuckDB twin; `rankedSql` yields (query_id, rank, corpus_id). */
  def ndcgAtKSql(rankedSql: String, k: Int): String = {
    val dcg = (1 to k).map(r =>
      s"CASE WHEN rank = $r AND rel = 1 THEN ${w(r)} ELSE 0 END")
      .mkString(" + ")
    val idcg = "CASE " + (1 to k).map(r =>
      s"WHEN n_rel_total >= $r THEN ${cumW(math.min(r, k))}")
      .reverse.mkString(" ") + " END"
    s"""WITH ranked AS (SELECT * FROM ($rankedSql) WHERE rank <= $k),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |lc AS (SELECT label, count(*) AS n_label FROM lab GROUP BY 1),
       |scored AS (SELECT r.query_id, r.rank, ql.label AS q_label,
       |    CASE WHEN ql.label = cl.label THEN 1 ELSE 0 END AS rel
       |  FROM ranked r
       |  JOIN lab ql ON ql.vec_id = r.query_id
       |  JOIN lab cl ON cl.vec_id = r.corpus_id),
       |agg AS (SELECT query_id, q_label,
       |    CAST(sum(rel) AS BIGINT) AS n_rel_topk,
       |    CAST(sum($dcg) AS BIGINT) AS dcg_e6
       |  FROM scored GROUP BY 1, 2),
       |fin AS (SELECT query_id, n_rel_topk,
       |    CAST(n_label - 1 AS BIGINT) AS n_rel_total, dcg_e6
       |  FROM agg JOIN lc ON lc.label = agg.q_label)
       |SELECT query_id, n_rel_topk, n_rel_total, dcg_e6,
       |  CAST($idcg AS BIGINT) AS idcg_e6,
       |  CASE WHEN ($idcg) > 0 THEN
       |    CAST((dcg_e6 * 1000000) // ($idcg) AS BIGINT) END
       |    AS ndcg_e6
       |FROM fin ORDER BY query_id""".stripMargin.replace('\n', ' ')
  }
}
