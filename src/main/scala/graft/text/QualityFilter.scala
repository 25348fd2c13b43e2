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
  *     rounded double division, then ln, rounded to 6 dp (the ml12/x40
  *     discipline);
  *  3. SCORING joins the broadcast model and takes the per-doc mean
  *     token log-odds x_d = Σ c_b·w_b / n_tokens — terms rounded to
  *     6 dp and summed in DECIMAL so partial-sum order is irrelevant,
  *     one doc-keyed shuffle with map-side partials;
  *  4. CALIBRATION is IRLS on the single feature x (three Newton
  *     iterations, each one aggregate pass; betas bit-identical across
  *     engines by LogisticIrls's determinism contract), and the final
  *     probability p = σ(b0 + b1·x) rounded to 6 dp.
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
            .cast("double")), 6).as("w"))
  }

  /** Raw quality feature per doc: x = mean token log-odds under the
    * broadcast model. Scan-speed; no vocabulary join. */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 64): DataFrame =
    bucketCounts(docs.withColumn("__y", lit(0.0)), idCol, textCol,
      "__y", buckets)
      .join(broadcast(model), Seq("idx"))
      .withColumn("t", round(col("c") * col("w"), 6)
        .cast("decimal(38,6)"))
      .groupBy(col(idCol))
      .agg(sum(col("t")).as("ts"), sum(col("c")).as("n"))
      .select(col(idCol),
        round(col("ts").cast("double") / col("n"), 6).as("x"))

  /** Fit on the labeled set and return every labeled doc with its raw
    * feature x and calibrated probability p — the table a curation
    * pipeline thresholds on. Model + calibration both come from
    * `labeled`; to score an unlabeled corpus, reuse [[tokenLogOdds]] +
    * [[score]] with frozen betas. */
  def fitScore(labeled: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", yCol: String = "y", buckets: Int = 64,
      iters: Int = 3): DataFrame = {
    val model = tokenLogOdds(labeled, idCol, textCol, yCol, buckets)
    val scored = score(labeled.select(col(idCol), col(textCol)), model,
      idCol, textCol, buckets)
      .join(labeled.select(col(idCol), col(yCol)), Seq(idCol))
    val last = LogisticIrls.train(scored, "x", yCol, iters)
      .collect().maxBy(_.getInt(0))
    val (b0, b1) = (last.getDouble(1), last.getDouble(2))
    scored.withColumn("p", round(lit(1.0) /
      (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x")))), 6))
  }
}
