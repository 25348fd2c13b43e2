package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.LogisticIrls

/** Model-based document quality filter (t27) — the fastText-style
  * classifier every production corpus pipeline runs before sampling
  * (CCNet / LLaMA-pretraining lineage), composed from machinery already
  * in the repo: ml10's HASHED token features (no vocabulary dictionary,
  * so no global distinct and no vocabulary-sized join — the hash IS the
  * vocabulary, which is what still works when the vocabulary alone is
  * TB-scale) + a Laplace-smoothed per-bucket log-odds model + a 1-D
  * logistic calibration via [[graft.ml.LogisticIrls]].
  *
  * Pipeline, with the 100 TB shape of each stage:
  *  1. tokens hash to `buckets` slots via a 48-bit md5 prefix (exact in
  *     both engines, ml10's construction) — scan speed, row-local;
  *  2. the MODEL is one |buckets|-row table: per bucket, smoothed
  *     log-odds of clean-vs-junk token mass,
  *     w_b = ln((pos_b+1)(neg_tot+B) / ((neg_b+1)(pos_tot+B))) —
  *     one partial-aggregatable count pass over the labeled set;
  *     integer products stay < 2⁵³ so the ratio is ONE correctly-
  *     rounded double division, then ln, quantized to INTEGER
  *     MICRO-UNITS via a 0-dp round (the round-8 q6 discipline: at
  *     0 dp a double is either exactly on a half-integer, where all
  *     away-from-zero engines agree, or strictly on one side — no
  *     string-tie exposure, unlike the round(double, 6) the rounding
  *     audit flagged here);
  *  3. SCORING joins the broadcast model and takes the per-doc mean
  *     token log-odds x_d = Σ c_b·w_b / n_tokens — EXACT integer
  *     micro-unit products summed as integers, the mean ONE
  *     sign-safe truncating integer division; one doc-keyed shuffle
  *     with map-side partials;
  *  4. CALIBRATION is IRLS on x = x_micro/10⁶ (three Newton
  *     iterations, each one aggregate pass; betas bit-identical across
  *     engines by LogisticIrls's q6 determinism contract), and the
  *     final probability micro-quantized the same way.
  *
  * The whole filter therefore scores at scan speed under a B-row
  * broadcast — no vocabulary join anywhere — and every arithmetic step
  * has an exact DuckDB twin, so the t27 harness entry is fully
  * oracle-checked (unlike sketch-based operators). */
object QualityFilter {

  /** (doc_id, y, idx, c): token counts per hashed bucket, per doc. */
  private def bucketCounts(labeled: DataFrame, idCol: String,
      textCol: String, yCol: String, buckets: Int): DataFrame =
    labeled
      .select(col(idCol), col(yCol),
        explode(TextAnalysis.tokens(
          TextAnalysis.normalized(col(textCol)))).as("tok"))
      .withColumn("idx", expr(
        s"CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT)" +
          s" % $buckets"))
      .groupBy(col(idCol), col(yCol), col("idx"))
      .agg(count(lit(1)).as("c"))

  /** The |buckets|-row log-odds model (idx, w) from labeled docs
    * (`yCol` ∈ {0.0, 1.0}; 1 = clean). */
  def tokenLogOdds(labeled: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", yCol: String = "y",
      buckets: Int = 64): DataFrame = {
    val bt = bucketCounts(labeled, idCol, textCol, yCol, buckets)
    val cls = bt.groupBy(col("idx")).agg(
      sum(when(col(yCol) === 1.0, col("c")).otherwise(0L)).as("pos_b"),
      sum(when(col(yCol) === 0.0, col("c")).otherwise(0L)).as("neg_b"))
    val tot = cls.agg(sum(col("pos_b")).as("pos_tot"),
      sum(col("neg_b")).as("neg_tot"))
    cls.crossJoin(broadcast(tot))
      .select(col("idx"), round(log(
        ((col("pos_b") + 1) * (col("neg_tot") + buckets)).cast("double") /
          ((col("neg_b") + 1) * (col("pos_tot") + buckets))
            .cast("double")) * lit(1000000.0)).cast("long")
        .as("w_micro"))
  }

  /** Raw quality feature per doc: x_micro = mean token log-odds
    * (micro-units, truncated toward zero) under the broadcast model.
    * Scan-speed; no vocabulary join; pure integer arithmetic. */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 64): DataFrame =
    bucketCounts(docs.withColumn("__y", lit(0.0)), idCol, textCol,
      "__y", buckets)
      .join(broadcast(model), Seq("idx"))
      .withColumn("t", col("c") * col("w_micro"))
      .groupBy(col(idCol))
      .agg(sum(col("t")).as("ts"), sum(col("c")).as("n"))
      .select(col(idCol),
        expr("CASE WHEN ts >= 0 THEN ts div n " +
          "ELSE -((-ts) div n) END").as("x_micro"))

  /** Fit on the labeled set and return every labeled doc with its raw
    * feature x and calibrated probability p — the table a curation
    * pipeline thresholds on. Model + calibration both come from
    * `labeled`; to score an unlabeled corpus, reuse [[tokenLogOdds]] +
    * [[score]] with frozen betas. */
  def fitScore(labeled: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", yCol: String = "y", buckets: Int = 64,
      iters: Int = 3): DataFrame = {
    val model = tokenLogOdds(labeled, idCol, textCol, yCol, buckets)
    // materialize the scored frame ONCE (guide §1.2): it feeds the
    // IRLS calibration (3 driver actions) AND the returned projection
    // — unbound, the tokenize+model pipeline re-executed for each
    // (measured round 15: 50 jobs for t27, 4 full pipeline runs).
    // Doc-grain rows (id, x_micro, y, x), scan-sized at any SF.
    val scored = score(labeled.select(col(idCol), col(textCol)), model,
      idCol, textCol, buckets)
      .join(labeled.select(col(idCol), col(yCol)), Seq(idCol))
      .withColumn("x",
        col("x_micro").cast("double") / lit(1000000.0))
      .localCheckpoint()
    val last = LogisticIrls.train(scored, "x", yCol, iters)
      .collect().maxBy(_.getInt(0))
    val (b0, b1) = (last.getDouble(1), last.getDouble(2))
    scored.withColumn("p_micro", round(lit(1.0) /
      (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x")))) *
      lit(1000000.0)).cast("long"))
  }
}
