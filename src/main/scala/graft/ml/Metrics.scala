package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed, exact binary-classification evaluation metrics.
  *
  * ROC-AUC is computed as the Mann-Whitney U statistic with the standard
  * average-rank tie handling, but WITHOUT ranking rows: aggregate to the
  * score grain first (one hash aggregate over the data), then a
  * cumulative negative count over distinct scores gives
  *
  *   AUC = (#pairs pos>neg + ½·#tied pairs) / (P·N)
  *       = (2·wins + ties) / (2·P·N)       — one integer-exact division.
  *
  * The cumulative sum over the score-grain table uses
  * [[graft.etl.Ids.keyedCumsum]]'s two-phase range-partition shape, so
  * no single task ever sees all distinct scores — the scale posture for
  * model-output grids (fp32 logits dedupe heavily; even fully-unique
  * scores only shuffle (score, n, p) triples, never rows).
  *
  * Evaluation is the last mile of every training-data pipeline (compare
  * the reference's metric block, ml_training/evaluate.py) — these are the
  * classification twins of its regression RMSE/MAE/R² set.
  */
object Metrics {

  /** One-row DataFrame: n_pos, n_neg, n_scores, auc. `labelCol` must be
    * 0/1 integers; ties in `scoreCol` get the standard ½ credit. */
  def binaryAuc(scored: DataFrame, labelCol: String = "label",
      scoreCol: String = "score"): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("p"))
      .withColumn("neg", col("n") - col("p"))
      .withColumn("__k", lit(1))
    val cum = graft.etl.Ids.keyedCumsum(
        byScore, "__k", Seq("score"), "neg", outName = "cum_neg")
      .withColumn("neg_below", col("cum_neg") - col("neg"))
    cum.agg(
        sum(col("p")).as("pos"), sum(col("neg")).as("negs"),
        count(lit(1)).as("n_scores"),
        sum(col("p") * col("neg_below")).as("wins"),
        sum(col("p") * col("neg")).as("ties"))
      .select(col("pos").as("n_pos"), col("negs").as("n_neg"),
        col("n_scores"),
        ((col("wins") * 2 + col("ties")).cast("double") /
          (col("pos") * col("negs") * 2).cast("double")).as("auc"))
  }

  /** Calibration / reliability table: scores bucketed into `bins` fixed
    * bins over [lo, hi), per-bin observed positive rate next to the
    * bin's mean score — the table a reliability diagram plots, and the
    * input to Platt/isotonic recalibration. One hash aggregate over the
    * scan; positive rates are single int/int divisions and mean scores
    * divide a DECIMAL-exact sum, so both engines produce identical
    * doubles. */
  def calibrationTable(scored: DataFrame, lo: Double, hi: Double,
      bins: Int, labelCol: String = "label",
      scoreCol: String = "score"): DataFrame = {
    require(bins >= 2 && hi > lo, s"need hi > lo and bins >= 2")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(scoreCol) - lo) / width))).cast("int")
    scored
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("n_pos"),
        sum(col(scoreCol).cast("decimal(18,6)")).as("sum_s"))
      .select(col("bin"), (lit(lo) + col("bin") * width).as("bin_lo"),
        col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        (col("sum_s").cast("double") / col("n")).as("mean_score"))
      .orderBy("bin")
  }

  /** Confusion matrix + derived rates at a fixed decision threshold
    * (predict positive iff score ≥ threshold). One conditional-sum
    * aggregate over the scan; every rate is a single integer/integer
    * division so both engines produce the identical double. */
  def confusionAtThreshold(scored: DataFrame, threshold: Double,
      labelCol: String = "label", scoreCol: String = "score"): DataFrame = {
    val pred = (col(scoreCol) >= threshold).cast("int")
    val lab = col(labelCol)
    scored
      .agg(
        sum(when(lab === 1 && pred === 1, 1).otherwise(0)).as("tp"),
        sum(when(lab === 0 && pred === 1, 1).otherwise(0)).as("fp"),
        sum(when(lab === 0 && pred === 0, 1).otherwise(0)).as("tn"),
        sum(when(lab === 1 && pred === 0, 1).otherwise(0)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        ((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"))
          .as("accuracy"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        (col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        ((col("tp") * 2).cast("double") /
          (col("tp") * 2 + col("fp") + col("fn")).cast("double"))
          .as("f1"))
  }
}
