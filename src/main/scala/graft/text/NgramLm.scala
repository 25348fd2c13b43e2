package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring (t28) — the UNSUPERVISED half of the
  * CCNet-style quality stack next to [[QualityFilter]]'s supervised
  * classifier: score each document by its average negative log
  * likelihood under an add-one-smoothed bigram model trained on a
  * reference corpus. High avg-NLL ≈ high perplexity ≈ text unlike the
  * reference — the signal CCNet thresholds (via KenLM) to bucket
  * CommonCrawl into head/middle/tail before training-data selection.
  *
  * Model: P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |vocab| of
  * the reference; unseen history (c(w1)=0) degrades to 1/V. Per doc,
  * avg_nll = mean over its bigrams of −ln P.
  *
  * Scale shape: the model is two count tables bounded by vocabulary —
  * unigram |V| rows, bigram ≤ observed-pair rows — built in one
  * partial-aggregatable pass over the reference and BROADCAST back; at
  * a 100 TB corpus the tokens would hash to 64-bit keys first (the
  * ml10/t27 move — kept as strings here so DuckDB mirrors the joins
  * exactly) and the bigram table prunes to top-k pairs per history,
  * exactly how KenLM-style filters deploy. Scoring is scan speed:
  * bigram rows explode row-locally from the materialized token array
  * (the HOF rule: the array is a bound column, never the tokenizer
  * expression), join the broadcast counts, and reduce with one
  * doc-keyed aggregate.
  *
  * Determinism (the round-8 q6 discipline): counts are exact
  * integers; (cb+1)/(cu+V) is ONE double division of exact operands;
  * each −ln term quantizes to INTEGER MICRO-NATS via a 0-dp round
  * (`round(x·10⁶)` — at 0 dp every double is either exactly on a
  * half-integer, where all away-from-zero engines agree, or strictly
  * on one side; the 6-dp `round(double, 6)` it replaces could
  * string-tie on values whose binary expansion is NOT the boundary,
  * the class the round-8 rounding audit flagged here) and sums as
  * exact integers; the final mean is ONE sign-safe truncating integer
  * division. Zero convention-exposed rounds; fully
  * oracle-checkable. */
object NgramLm {

  /** (w1, w2) struct rows from a MATERIALIZED token-array column. */
  private def bigramsOf(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => struct(element_at(toks, i).as("w1"),
        element_at(toks, i + 1).as("w2")))

  private def tokCol(textCol: String): Column =
    TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))

  /** Score `docs` under the bigram model of `ref`: one row per doc
    * with ≥2 tokens — (idCol, n_bigrams, avg_nll_micro) with the mean
    * NLL in integer micro-nats. */
  def avgNll(ref: DataFrame, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val refToks = ref.select(tokCol(textCol).as("toks"))
    val cu = refToks.select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val v = cu.agg(count(lit(1)).as("v"))
    val cb = refToks.filter(size(col("toks")) >= 2)
      .select(explode(bigramsOf(col("toks"))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val docBi = docs
      .select(col(idCol), tokCol(textCol).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(bigramsOf(col("toks"))).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
    docBi
      .join(broadcast(cb), Seq("w1", "w2"), "left")
      .join(broadcast(cu), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("nll", expr("CAST(round(" +
        "-ln(CAST(coalesce(cb, 0) + 1 AS DOUBLE) / " +
        "CAST(coalesce(cu, 0) + v AS DOUBLE)) * 1000000) AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll")).as("s"))
      .select(col(idCol), col("n_bigrams"),
        expr("CASE WHEN s >= 0 THEN s div n_bigrams " +
          "ELSE -((-s) div n_bigrams) END").as("avg_nll_micro"))
  }
}
