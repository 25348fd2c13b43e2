package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * given a small TARGET corpus (the distribution you want more of) and
  * a large RAW pool, fit hashed-n-gram bag-of-words models p (target)
  * and q (raw), score every raw document by its log importance weight
  * `w(x) = Σ_features log(p_b / q_b)`, and keep the top-k — the
  * standard published recipe for steering a 100 TB crawl toward a
  * curated domain without training a classifier.
  *
  * Determinism: the paper resamples with Gumbel noise; this
  * implementation is the temperature-0 variant (rank by weight,
  * tie-break by id) so the selection is exactly reproducible across
  * engines and runs — the same adjudication as [[TextAnalysis.stableSample]]
  * replacing RNG sampling.
  *
  * Cross-engine arithmetic (the t16/t31 discipline): bucket counts are
  * exact integers; each smoothed log-probability
  * `ln((c_b + 1) / (N + B))` is one double division + one `ln`,
  * spelled identically in both engines and rounded ONCE to 6 dp into
  * DECIMAL(12,6); the per-bucket ratio λ_b and the per-document sum
  * are then exact decimal arithmetic, so partial-sum order can never
  * flip a hash. The md5-prefix bucket hash is the engine-portable t6
  * pattern (xxhash64 has no DuckDB twin).
  *
  * Scale shape: features materialize row-locally (bigrams over the
  * token array — the t19 element_at-over-attribute pattern); the two
  * model fits are ONE partial-aggregating groupBy each, whose result
  * is ≤ B rows REGARDLESS of corpus size — so λ is always
  * broadcast-sized and scoring is a broadcast join + one hash
  * aggregate at document grain. Selection is TakeOrderedAndProject
  * (fixed k, no global sort). The raw corpus never shuffles by text.
  */
object Dsir {

  /** Bumped whenever the λ model's feature extraction or estimator
    * changes shape (tokenizer, bigram builder, smoothing, bucketing) —
    * persisted-λ cache keys (s20) embed it so artifacts written by an
    * older algorithm are never silently reused. */
  val AlgoVersion = "dsir-v1"

  /** Engine-portable feature hash: md5-prefix of the bigram, mod B
    * (48-bit non-negative, so `%` == `pmod`). */
  private def bucketExpr(bg: String, buckets: Int): String =
    s"CAST(conv(substring(md5($bg), 1, 12), 16, 10) AS BIGINT) % $buckets"

  private def bucketSql(bg: String, buckets: Int): String =
    s"CAST(('0x' || substr(md5($bg), 1, 12)) AS BIGINT) % $buckets"

  /** (doc_id, is_target, bucket) at feature-OCCURRENCE grain: hashed
    * bigrams of the normalized whitespace tokens. Documents with < 2
    * tokens contribute no features (and score 0 in [[weights]]). */
  private def features(docs: DataFrame, targetCond: Column,
      buckets: Int, idCol: String, textCol: String): DataFrame = {
    // materialize the token array behind its own projection BEFORE the
    // bigram lambda (the t19/bandedBuckets HOF-inlining trap: element_at
    // over the raw tokenizer tree re-runs the whole chain per element)
    val withToks = docs.select(col(idCol).as("doc_id"),
      targetCond.as("is_target"),
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
        .as("toks"))
    withToks
      // a 1-token doc has no bigrams — and Spark's sequence(1, 0)
      // DESCENDS [1, 0] instead of returning empty, so the guard is
      // load-bearing, not just a skip
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_target"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1)))).as("bg"))
      .withColumn("bucket", expr(bucketExpr("bg", buckets)))
      .drop("bg")
  }

  /** DENSE per-bucket log-ratio model λ over ALL B buckets — the
    * persistable artifact (write it once, gate any future batch
    * against it; the s20 stream gate's offline half). Unseen buckets
    * carry the pure-smoothing default ln((Nr+B)/(Nt+B)). Always
    * exactly B rows — kilobytes at any corpus size. Each ln rounds
    * once to 6 dp (the t16 discipline); λ is an exact decimal
    * difference. */
  def denseLambda(docs: DataFrame, targetCond: Column,
      buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val feats = features(docs, targetCond, buckets, idCol, textCol)
      .localCheckpoint()
    val tAgg = feats.filter(col("is_target"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val tTot = tAgg.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val rAgg = feats.filter(!col("is_target"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val rTot = rAgg.agg(coalesce(sum(col("cr")), lit(0L)).as("nr"))
    docs.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
      .join(tAgg, Seq("bucket"), "left")
      .join(rAgg, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (round(log((coalesce(col("ct"), lit(0L)) + lit(1L))
            .cast("double") / (col("nt") + lit(buckets.toLong))), 6)
          .cast("decimal(12,6)") -
          round(log((coalesce(col("cr"), lit(0L)) + lit(1L))
            .cast("double") / (col("nr") + lit(buckets.toLong))), 6)
            .cast("decimal(12,6)")).as("lmb"))
  }

  /** Score a pool against a (possibly persisted) λ model from
    * [[denseLambda]]: (doc_id, n_feats, weight) per pool doc,
    * featureless docs at exactly 0. One broadcast join + one
    * doc-grain aggregate — the pool's text never shuffles. */
  def scoreWith(lambda: DataFrame, pool: DataFrame, buckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats =
      features(pool, lit(false), buckets, idCol, textCol)
    val scoredDocs = feats
      .join(broadcast(lambda), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lmb")).as("w_d"))
    pool.select(col(idCol).as("doc_id"))
      .join(scoredDocs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_d").cast("double"), lit(0d)).as("weight"))
  }

  /** Per-raw-document DSIR importance weights: [[denseLambda]] fit on
    * the full corpus, [[scoreWith]] applied to the raw pool (pool
    * features only ever hit raw-populated buckets, so the dense model
    * scores identically to a raw-domain one).
    *
    * @param docs       corpus (idCol, textCol, …)
    * @param targetCond boolean Column splitting docs into target
    *                   (true) and raw pool (false)
    * @param buckets    hashed feature-space size B
    * @return one row per RAW document: (doc_id, n_feats, weight) —
    *         weight = Σ_occurrences λ_bucket as exact decimal cast to
    *         double; featureless documents carry weight 0. */
  def weights(docs: DataFrame, targetCond: Column, buckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreWith(denseLambda(docs, targetCond, buckets, idCol, textCol),
      docs.filter(!targetCond), buckets, idCol, textCol)

  /** Top-k selection from [[weights]] — temperature-0 DSIR: highest
    * importance weight first, doc_id tie-break. Fixed k ⇒
    * TakeOrderedAndProject, never a global sort. */
  def selectTopK(docs: DataFrame, targetCond: Column, k: Int,
      buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    weights(docs, targetCond, buckets, idCol, textCol)
      .orderBy(desc("weight"), col("doc_id")).limit(k)
  }

  /** Shared CTE text: bigram-bucket features of `rel` (must yield
    * doc_id, text, plus anything `extra` needs) as CTE `name`. */
  private def featsCte(name: String, rel: String, buckets: Int): String = {
    val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
    s"""${name}_t AS (SELECT doc_id, $toks AS toks FROM $rel),
       |$name AS (SELECT doc_id, ${bucketSql("bg", buckets)} AS bucket
       |  FROM (SELECT doc_id, unnest(list_transform(
       |      range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))
       |      AS bg
       |    FROM ${name}_t))""".stripMargin
  }

  /** DuckDB twin of [[denseLambda]] (fit on `documents`) +
    * [[scoreWith]] over `poolRel` with a weight>0 keep flag — the s20
    * gate's batch oracle. */
  def gateSql(poolRel: String, targetSql: String,
      buckets: Int = 4096): String = {
    val b = buckets
    s"""WITH ${featsCte("mf",
         s"(SELECT doc_id, text FROM documents WHERE $targetSql)", b)},
       |${featsCte("rf",
         s"(SELECT doc_id, text FROM documents WHERE NOT ($targetSql))",
         b)},
       |tagg AS (SELECT bucket, count(*) AS ct FROM mf GROUP BY 1),
       |ttot AS (SELECT COALESCE(sum(ct), 0) AS nt FROM tagg),
       |ragg AS (SELECT bucket, count(*) AS cr FROM rf GROUP BY 1),
       |rtot AS (SELECT COALESCE(sum(cr), 0) AS nr FROM ragg),
       |lam AS (SELECT g.i AS bucket,
       |    CAST(round(ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
       |        / (nt + $b)), 6) AS DECIMAL(12,6))
       |    - CAST(round(ln(CAST(COALESCE(r.cr, 0) + 1 AS DOUBLE)
       |        / (nr + $b)), 6) AS DECIMAL(12,6)) AS lmb
       |  FROM range(0, $b) g(i)
       |  LEFT JOIN tagg t ON t.bucket = g.i
       |  LEFT JOIN ragg r ON r.bucket = g.i
       |  CROSS JOIN ttot CROSS JOIN rtot),
       |pool AS (SELECT doc_id, text FROM $poolRel),
       |${featsCte("pf", "pool", b)},
       |scored AS (SELECT doc_id, count(*) AS n_feats, sum(lmb) AS w_d
       |  FROM pf JOIN lam USING (bucket) GROUP BY 1)
       |SELECT p.doc_id,
       |  COALESCE(s.n_feats, 0) AS n_feats,
       |  COALESCE(CAST(s.w_d AS DOUBLE), 0) AS weight,
       |  CASE WHEN COALESCE(CAST(s.w_d AS DOUBLE), 0) > 0
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kept
       |FROM pool p LEFT JOIN scored s USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin.replace('\n', ' ')
  }

  /** DuckDB twin of [[selectTopK]] over the `documents` table.
    * `targetSql` must be the boolean SQL twin of `targetCond`. */
  def selectTopKSql(targetSql: String, k: Int,
      buckets: Int = 4096): String = {
    val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
    val b = buckets
    s"""WITH base AS (SELECT doc_id, ($targetSql) AS is_target,
       |    $toks AS toks FROM documents),
       |feats AS (SELECT doc_id, is_target,
       |    ${bucketSql("bg", b)} AS bucket
       |  FROM (SELECT doc_id, is_target, unnest(list_transform(
       |      range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))
       |      AS bg
       |    FROM base)),
       |tagg AS (SELECT bucket, count(*) AS ct FROM feats
       |  WHERE is_target GROUP BY 1),
       |ttot AS (SELECT COALESCE(sum(ct), 0) AS nt FROM tagg),
       |ragg AS (SELECT bucket, count(*) AS cr FROM feats
       |  WHERE NOT is_target GROUP BY 1),
       |rtot AS (SELECT COALESCE(sum(cr), 0) AS nr FROM ragg),
       |lambda AS (SELECT r.bucket,
       |    CAST(round(ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
       |        / (nt + $b)), 6) AS DECIMAL(12,6))
       |    - CAST(round(ln(CAST(r.cr + 1 AS DOUBLE)
       |        / (nr + $b)), 6) AS DECIMAL(12,6)) AS lmb
       |  FROM ragg r LEFT JOIN tagg t ON r.bucket = t.bucket
       |  CROSS JOIN ttot CROSS JOIN rtot),
       |scored AS (SELECT doc_id, count(*) AS n_feats,
       |    sum(lmb) AS w_d
       |  FROM feats JOIN lambda USING (bucket)
       |  WHERE NOT is_target GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(s.n_feats, 0) AS n_feats,
       |  COALESCE(CAST(s.w_d AS DOUBLE), 0) AS weight
       |FROM (SELECT doc_id FROM documents WHERE NOT ($targetSql)) d
       |LEFT JOIN scored s USING (doc_id)
       |ORDER BY weight DESC, doc_id LIMIT $k""".stripMargin
      .replace('\n', ' ')
  }
}
