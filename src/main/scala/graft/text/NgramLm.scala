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
  * Determinism (the ml12/t27 discipline): counts are exact integers;
  * (cb+1)/(cu+V) is ONE double division of exact operands; each −ln
  * term rounds to 6 dp and sums in DECIMAL so partial-sum order is
  * irrelevant; the final mean divides the exact sum by the exact
  * bigram count. Fully oracle-checkable. */
object NgramLm {

  /** (w1, w2) struct rows from a MATERIALIZED token-array column. */
  private def bigramsOf(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => struct(element_at(toks, i).as("w1"),
        element_at(toks, i + 1).as("w2")))

  private def tokCol(textCol: String): Column =
    TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))

  /** Score `docs` under the bigram model of `ref`: one row per doc
    * with ≥2 tokens — (idCol, n_bigrams, avg_nll). */
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
      .withColumn("nll", round(-log(
        (coalesce(col("cb"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast("double")), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast("decimal(38,6)")).as("s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams"), 6)
          .as("avg_nll"))
  }
}
