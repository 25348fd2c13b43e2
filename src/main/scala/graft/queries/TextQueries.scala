package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.table
import graft.text.TextAnalysis

/** Registry + DuckDB oracle twins for the text-analysis surface over the
  * `documents` table (training-data pipeline operators). */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_quality_features" -> ((s, d) =>
      TextAnalysis.qualityFeatures(table(s, d, "documents"))
        .select("doc_id", "n_chars_actual", "n_tokens", "avg_token_len",
          "digit_ratio", "punct_ratio", "stopword_ratio", "is_quality")
        .orderBy("doc_id")),
    "t2_language_id" -> ((s, d) =>
      TextAnalysis.langId(table(s, d, "documents"))
        .select(Seq(col("doc_id"), col("lang")) ++
          TextAnalysis.langMarkers.map { case (l, _) => col(s"score_$l") } ++
          Seq(col("predicted_lang"),
            (col("predicted_lang") === col("lang")).as("lang_match")): _*)
        .orderBy("doc_id")),
    "t3_token_stats" -> ((s, d) =>
      TextAnalysis.tokenStats(table(s, d, "documents"))
        .select("doc_id", "n_chars", "n_ws_tokens", "n_bpe_tokens",
          "n_unique_tokens")
        .orderBy("doc_id")),
    "t4_fingerprint" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),
    "t5_tfidf_top3" -> ((s, d) =>
      TextAnalysis.tfIdfTopK(table(s, d, "documents"))
        .orderBy("doc_id", "rnk")),
    // deterministic 30% content-hash sample (dedup-aligned, RNG-free)
    "t6_stable_sample" -> ((s, d) =>
      TextAnalysis.stableSample(table(s, d, "documents"), "text", 0.3)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "t1_quality_features" ->
      (s"SELECT doc_id, ${TextAnalysis.qualityFeaturesSql("text")} " +
        "FROM documents ORDER BY doc_id"),
    // DuckDB lateral alias reference: lang_match reuses predicted_lang
    "t2_language_id" ->
      (s"SELECT doc_id, lang, ${TextAnalysis.langIdSql("text")}, " +
        "predicted_lang = lang AS lang_match " +
        "FROM documents ORDER BY doc_id"),
    "t3_token_stats" ->
      (s"SELECT doc_id, n_chars, ${TextAnalysis.tokenStatsSql("text")} " +
        "FROM documents ORDER BY doc_id"),
    "t4_fingerprint" ->
      (s"SELECT doc_id, ${TextAnalysis.fingerprintSql("text")} " +
        "AS fingerprint FROM documents ORDER BY doc_id"),
    "t5_tfidf_top3" ->
      (TextAnalysis.tfIdfTopKSql(3) + " ORDER BY doc_id, rnk"),
    "t6_stable_sample" ->
      (s"SELECT doc_id, lang, source, n_chars FROM documents " +
        s"WHERE ${TextAnalysis.stableSampleSql("text", 0.3)} " +
        "ORDER BY doc_id")
  )
}
