package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based source mixing (t36) — the multilingual /
  * multi-source sampling-weight computation of XLM-R / mT5 / CCNet
  * lineage: given per-source document counts n_i, sample source i
  * with probability p_i ∝ n_i^α (α < 1 up-weights low-resource
  * sources; α = 1 is natural sampling, α = 0 uniform). The operator
  * emits, per source, the exact integer sampling weight and the
  * per-source document budget for a target corpus size — the table a
  * curation pipeline feeds into t24's deterministic hash sampler.
  *
  * Determinism (the round-8 q6 discipline): n^α = exp(α·ln n) is one
  * ln, one multiply, one exp — identical IEEE trees in both engines —
  * then immediately quantized to integer micro-units via a 0-dp round
  * (only exact binary ties exist at scale 0, and every practical
  * engine rounds those away from zero). All downstream arithmetic —
  * the Σ n_i^α normalizer, ppm weights, budget allocation — is pure
  * integer: sums of BIGINTs and sign-safe truncating divisions, so
  * double summation ORDER (the classic cross-engine trap for
  * Σ exp(...)) never arises.
  *
  * Scale: one partial-aggregatable (source → count) pass over the
  * corpus; everything after runs on the |sources|-row table. */
object SourceMix {

  /** @param docs corpus with a `sourceCol`
    * @param alpha temperature exponent (e.g. 0.7)
    * @param budget total documents the mixed sample should contain
    * @return (source, n_docs, scaled_micro, weight_ppm, target_docs)
    *         ordered by source; Σ target_docs ≤ budget (truncation) */
  def temperatureMix(docs: DataFrame, sourceCol: String = "source",
      alpha: Double = 0.7, budget: Long = 100000L): DataFrame = {
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      // n^alpha quantized straight to micro ints (q6: 0-dp rounds
      // cannot inexact-tie), BEFORE any cross-source arithmetic
      .withColumn("scaled_micro", expr(
        s"CAST(round(exp(CAST('$alpha' AS DOUBLE) * ln(n_docs)) " +
          "* 1000000) AS BIGINT)"))
    val total = counts.agg(sum(col("scaled_micro")).as("denom"))
    counts.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("scaled_micro"),
        expr("(CAST(scaled_micro AS DECIMAL(38,0)) * 1000000)" +
          " div denom").cast("long").as("weight_ppm"),
        expr(s"(CAST(scaled_micro AS DECIMAL(38,0)) * $budget)" +
          " div denom").cast("long").as("target_docs"))
      .orderBy("source")
  }

  /** DuckDB twin; `docsRel` must yield a `source` column. */
  def temperatureMixSql(docsRel: String = "documents",
      alpha: Double = 0.7, budget: Long = 100000L): String =
    s"""WITH counts AS (SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs
       |  FROM $docsRel GROUP BY 1),
       |scaled AS (SELECT source, n_docs,
       |    CAST(round(exp(CAST('$alpha' AS DOUBLE) * ln(n_docs))
       |      * 1000000) AS BIGINT) AS scaled_micro
       |  FROM counts),
       |tot AS (SELECT sum(scaled_micro) AS denom FROM scaled)
       |SELECT source, n_docs, scaled_micro,
       |  CAST((CAST(scaled_micro AS HUGEINT) * 1000000) // denom
       |    AS BIGINT) AS weight_ppm,
       |  CAST((CAST(scaled_micro AS HUGEINT) * $budget) // denom
       |    AS BIGINT) AS target_docs
       |FROM scaled CROSS JOIN tot
       |ORDER BY source""".stripMargin.replace('\n', ' ')
}
