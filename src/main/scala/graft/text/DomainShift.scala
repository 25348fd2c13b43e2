package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source domain-shift scoring (t31): KL(P_source ‖ P_corpus) over
  * token unigram distributions — the corpus-curation diagnostic that
  * ranks which ingestion sources speak a different language than the
  * blend (high KL = niche/drifting source; the quantity behind "domain
  * weighting" decisions like DoReMi's and the t21/t26 mixture knobs).
  *
  * KL here is always finite by construction: every source token is in
  * the corpus (the corpus IS the union of sources), so q(t) > 0
  * whenever p(t) > 0.
  *
  * Scale shape: ONE tokenize+count pass to the (source, token) grain —
  * vocabulary-bounded, partial-aggregatable; the global distribution
  * derives from that same grain by a second tiny aggregate (the corpus
  * is never re-read). Probability ratios are double divisions of exact
  * integers spelled identically in both engines; each KL term rounds
  * once to 6 dp and the per-source sum runs in DECIMAL(38,6), so
  * partial-sum order is irrelevant — the t27 discipline. */
object DomainShift {

  /** @return (source, n_tokens, n_vocab, kl) per source. */
  def sourceKl(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val cst = docs
      .select(col(srcCol).as("src"), explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol)))).as("tok"))
      .groupBy(col("src"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
      // referenced three times (ct, ns, the term join): truncate so the
      // corpus tokenizes exactly once
      .localCheckpoint()
    val ct = cst.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = cst.groupBy(col("src")).agg(sum(col("c_st")).as("n_s"))
    val n = ns.agg(sum(col("n_s")).as("n"))
    cst
      .join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("src"))
      .crossJoin(broadcast(n))
      .withColumn("term", round(
        (col("c_st").cast("double") / col("n_s")) *
          log((col("c_st").cast("double") / col("n_s")) /
            (col("c_t").cast("double") / col("n"))), 6)
        .cast("decimal(38,6)"))
      .groupBy(col("src"), col("n_s"))
      .agg(count(lit(1)).as("n_vocab"),
        sum(col("term")).as("klsum"))
      .select(col("src").as("source"), col("n_s").as("n_tokens"),
        col("n_vocab"), col("klsum").cast("double").as("kl"))
      .orderBy("source")
  }

  /** DuckDB twin of [[sourceKl]] over the `documents` table. */
  def sourceKlSql(srcCol: String = "source"): String = {
    val norm = TextAnalysis.normalizedSql("text")
    s"""WITH toks AS (SELECT $srcCol AS src,
       |    unnest(regexp_split_to_array($norm, '\\s+')) AS tok
       |  FROM documents),
       |cst AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c_st
       |  FROM toks GROUP BY 1, 2),
       |ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t
       |  FROM cst GROUP BY 1),
       |ns AS (SELECT src, CAST(sum(c_st) AS BIGINT) AS n_s
       |  FROM cst GROUP BY 1),
       |nn AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM ns),
       |terms AS (SELECT cst.src, ns.n_s,
       |    CAST(round((CAST(c_st AS DOUBLE) / n_s) *
       |      ln((CAST(c_st AS DOUBLE) / n_s) /
       |         (CAST(c_t AS DOUBLE) / n)), 6) AS DECIMAL(38,6)) AS term
       |  FROM cst JOIN ct USING (tok) JOIN ns ON ns.src = cst.src
       |  CROSS JOIN nn)
       |SELECT src AS source, n_s AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_vocab,
       |  CAST(sum(term) AS DOUBLE) AS kl
       |FROM terms GROUP BY 1, 2 ORDER BY source"""
      .stripMargin.replace('\n', ' ')
  }
}
