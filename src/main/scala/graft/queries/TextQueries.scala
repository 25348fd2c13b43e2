package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.table
import graft.text.TextAnalysis

/** Registry + DuckDB oracle twins for the text-analysis surface over the
  * `documents` table (training-data pipeline operators). */
object TextQueries {

  /** The shared BM25 demo query (terms from the synthetic vocabulary). */
  val bm25Query: Seq[String] = Seq("spark", "window", "hash")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flesch-style readability from three regex counts (words, vowel
    // groups as the syllable heuristic, sentence breaks) — scan-speed
    // per-row math, the quality-scoring sibling of t1. Both ratios are
    // int/int divisions of identical operands; the constants enter one
    // fixed expression order, so the score is bit-stable unrounded
    // (rounded to 4dp only for display)
    "t25_readability" -> ((s, d) => {
      val lowered = lower(col("text"))
      table(s, d, "documents")
        .withColumn("n_words", regexp_count(lowered, lit("[a-z]+")))
        .withColumn("n_vowel_groups",
          regexp_count(lowered, lit("[aeiouy]+")))
        .withColumn("n_sentences",
          greatest(lit(1), regexp_count(col("text"), lit("[.!?]+"))))
        .filter(col("n_words") >= 1)
        .withColumn("flesch", round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_vowel_groups").cast("double") /
            col("n_words").cast("double")), 4))
        .select("doc_id", "n_words", "n_sentences", "n_vowel_groups",
          "flesch")
        .orderBy("doc_id")
    }),
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
        .orderBy("doc_id")),
    // weighted sampling without replacement (Efraimidis-Spirakis log
    // priorities from the content hash): top-100 docs, inclusion odds
    // proportional to n_chars — RNG-free importance sampling
    "t24_weighted_sample" -> ((s, d) =>
      TextAnalysis.weightedSample(table(s, d, "documents"), "text",
        "n_chars", k = 100)),
    // the composed C4-style clean: dedup → lang gate → quality gate →
    // down-sample, planted exact duplicates to make the dedup stage bite
    "t7_corpus_clean" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val doubledDocs =
        docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 100000))
      TextAnalysis.cleanCorpus(doubledDocs, lang = "en", sampleRate = 0.5)
        .select("doc_id", "lang", "predicted_lang", "n_tokens",
          "n_chars_actual")
        .orderBy("doc_id")
    }),
    // stratified sampling: per-language keep rates (training-mix shaping)
    "t8_stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(table(s, d, "documents"),
        strataCol = "lang", textCol = "text",
        rates = Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.25),
        defaultRate = 0.1)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),
    // target-mixture balancing: derive each language's keep rate FROM a
    // 5:2:2:1 target and the observed counts (water-filling — binding
    // stratum keeps 100%, es has no weight and drops); t8's missing half
    "t26_target_mixture" -> ((s, d) =>
      TextAnalysis.targetMixtureSample(table(s, d, "documents"),
        strataCol = "lang", textCol = "text",
        weights = Map("en" -> 5, "de" -> 2, "fr" -> 2, "zh" -> 1))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),
    // Gopher-style repetition gates (dup-word / top-word / dup-bigram)
    "t9_repetition" -> ((s, d) =>
      TextAnalysis.repetitionFeatures(table(s, d, "documents"))
        .select("doc_id", "n_tokens", "dup_word_frac", "top_word_frac",
          "dup_bigram_frac", "is_repetitive")
        .orderBy("doc_id")),
    // token-budget training mix: greedy fingerprint-ordered prefix per
    // language up to a per-language token budget
    "t10_token_budget" -> ((s, d) =>
      TextAnalysis.tokenBudgetSample(table(s, d, "documents"),
        strataCol = "lang", budgets = Map("en" -> 6000L),
        defaultBudget = 2000L)
        .select("doc_id", "lang", "source", "n_tokens", "cum_tokens")
        .orderBy("doc_id")),
    // PII scrub: the testdata text is synthetic word salad with no real
    // PII, so the query plants emails/phones/IPs deterministically from
    // doc columns (doc_id mod cycles vary the per-row counts 0..3),
    // then counts and redacts them — both engines build and scrub the
    // same dirty corpus, so the oracle exercises real redaction
    "t12_pii_scrub" -> ((s, d) => {
      val dirty = table(s, d, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id"), lit("@"), col("source"), lit(".com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" from 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") * 7 % 256).cast("string")))
          .otherwise(lit(""))))
      TextAnalysis.piiScrub(dirty)
        .select("doc_id", "n_emails", "n_phones", "n_ips", "scrubbed",
          "has_pii")
        .orderBy("doc_id")
    }),
    // concat-and-chunk sequence packing into 512-token context windows,
    // one token stream per source shard in fingerprint order
    "t13_pack_sequences" -> ((s, d) =>
      TextAnalysis.packSequences(table(s, d, "documents"),
        strataCol = "source", capacity = 512)
        .select("doc_id", "lang", "source", "n_tokens", "pack_id",
          "offset_in_pack", "crosses_boundary")
        .orderBy("doc_id")),
    // sliding-window chunking: 64-token chunks every 48 tokens (16-token
    // overlap) — the RAG / long-context preprocessing fan-out
    "t14_chunk_overlap" -> ((s, d) =>
      TextAnalysis.chunkOverlap(table(s, d, "documents"),
        window = 64, stride = 48)
        .select("doc_id", "lang", "source", "n_tokens", "chunk_id",
          "chunk_start", "chunk_len", "chunk_text")
        .orderBy("doc_id", "chunk_id")),
    // Unicode NFC normalization (custom codegen'd expression — Spark has
    // no builtin): combining sequences planted on even doc_ids, the
    // precomposed equivalents on odd ones; normalized outputs agree and
    // only the combining side reports a change
    "t15_unicode_normalize" -> ((s, d) => {
      val planted = table(s, d, "documents").withColumn("dirty",
        concat(col("text"), when(col("doc_id") % 2 === 0,
          lit(" café naïve"))       // NFD: e/i + combining mark
          .otherwise(lit(" café naïve")))) // precomposed NFC
      planted.select(col("doc_id"),
        graft.expr.NfcNormalize.nfc(col("dirty")).as("text_nfc"),
        (graft.expr.NfcNormalize.nfc(col("dirty")) =!= col("dirty"))
          .as("changed"))
        .orderBy("doc_id")
    }),
    // unigram LM quality proxy: mean token log-prob under the corpus's
    // own unigram distribution (the offline perplexity-filter stand-in)
    "t16_unigram_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(table(s, d, "documents"))
        .orderBy("doc_id")),
    // deterministic 90/5/5 train/val/test split: content-hash ordered,
    // dup-aligned (no leakage through duplicate pairs), RNG-free
    "t18_three_way_split" -> ((s, d) =>
      TextAnalysis.threeWaySplit(table(s, d, "documents"), "text",
        valRate = 0.05, testRate = 0.05)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("split", "lang")),
    // bigram LM quality proxy: mean conditional bigram log-prob under
    // the corpus's own MLE bigram model (t16's unigram proxy one order
    // up — word salad scores low even with a normal unigram mix)
    "t19_bigram_logprob" -> ((s, d) =>
      TextAnalysis.bigramLogProb(table(s, d, "documents"))
        .orderBy("doc_id")),
    // BM25 retrieval: top-10 documents for a 3-term query — corpus
    // curation / eval-set mining by relevance, not substring match
    "t17_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(table(s, d, "documents"),
        TextQueries.bm25Query)),
    // top bigram collocations by PMI with a min-count cutoff — the
    // phrase-vocabulary mining pass (which word pairs co-occur far
    // beyond chance)
    "t23_pmi_collocations" -> ((s, d) =>
      TextAnalysis.pmiCollocations(table(s, d, "documents"))),
    // BPE merge training (t30): 8 rounds of count-pairs -> merge the
    // most frequent, on the VOCABULARY-sized (word, count) table —
    // the corpus is scanned exactly once. Double-space symbol
    // separators make plain string replace the exact greedy merge
    // in both engines; output is the learned merge table
    "t30_bpe_train" -> ((s, d) =>
      graft.text.Bpe.trainMerges(table(s, d, "documents"))),
    // per-source domain shift (t31): KL(P_source || P_corpus) over
    // token unigrams — ranks which ingestion sources diverge from the
    // blend (the domain-weighting diagnostic). One tokenize pass to
    // the vocabulary-bounded (source, token) grain; decimal-summed
    // 6dp terms, always-finite by construction
    "t31_source_kl" -> ((s, d) =>
      graft.text.DomainShift.sourceKl(table(s, d, "documents"))),
    // CLASSIFIER EVAL for the t2 language-ID heuristic (t32): the
    // labeled confusion matrix with per-truth share in exact basis
    // points — the eval loop every heuristic gate needs before it
    // filters a corpus. One scan + a |langs|²-row aggregate.
    "t32_langid_eval" -> ((s, d) => {
      val cm = TextAnalysis.langId(table(s, d, "documents"))
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = cm.groupBy(col("lang")).agg(sum(col("n_docs"))
        .as("n_lang"))
      cm.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("predicted_lang"), col("n_docs"),
          expr("n_docs * 10000 div n_lang").as("share_bp"))
        .orderBy("lang", "predicted_lang")
    }),
    // ZIPF rank-frequency fit (t33): OLS slope of ln(freq) on ln(rank)
    // over the top-100 tokens — the corpus-shape diagnostic next to
    // g19's degree-tail Hill exponent (natural text ≈ −1; generated /
    // templated corpora flatten). One scan to the vocabulary grain,
    // one vocabulary-bounded rank window, one 100-row aggregate; 6dp
    // ln terms, DECIMAL(28,12) products, fixed final trees
    "t33_zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfFit(table(s, d, "documents"))),
    // HEAPS'-LAW vocabulary growth (t34): V(N) ≈ K·N^β on nested
    // content-hash cuts — sizes tokenizer vocabularies and predicts
    // OOV at 100× the corpus; one scan to the (level, term) grain,
    // per-term min level replaces per-cut distinct counts (ml14's
    // nested-cut trick), zipf-discipline 4-point OLS
    "t34_heaps_law" -> ((s, d) =>
      TextAnalysis.heapsFit(table(s, d, "documents"))),
    // TextRank keywords (t29): PageRank over the word co-occurrence
    // graph — the graph-centrality keyword list next to frequency
    // (x3) and tf-idf (t5); vocabulary-bounded graph, exact integer
    // fixed-point rank, oracle unrolls the same 5 iterations
    "t29_textrank" -> ((s, d) =>
      TextAnalysis.textRankKeywords(table(s, d, "documents"))),
    // corpus health report: the per-row gates (quality, repetition,
    // language agreement) rolled up per (source, lang) — one pass over
    // the corpus, one metadata-sized aggregate; the monitoring query a
    // production cleaning pipeline runs after every ingest batch
    "t11_corpus_stats" -> ((s, d) => {
      val scored = TextAnalysis.repetitionFeatures(
        TextAnalysis.qualityFeatures(
          TextAnalysis.langId(table(s, d, "documents"))))
      // sums not averages: a 4-dp-ratio mean lands on round() ties the
      // engines split oppositely (the x17 lesson); consumers divide
      scored.groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("stopword_ratio").cast("decimal(8,4)")).cast("double")
            .as("sum_stopword_ratio"),
          sum(when(col("is_quality"), 1).otherwise(0)).as("n_quality"),
          sum(when(col("is_repetitive"), 1).otherwise(0))
            .as("n_repetitive"),
          sum(when(col("predicted_lang") === col("lang"), 1).otherwise(0))
            .as("n_lang_match"))
        .orderBy("source", "lang")
    }),
    // MODEL-BASED quality filter (t27): hashed-token log-odds + IRLS
    // calibration (graft.text.QualityFilter). Labels are planted:
    // docs < 400 are clean (y=1); every 3rd spawns a junk twin (every
    // token prefixed with 'q' — all its tokens hash to other buckets)
    // under id+500000 (y=0). Output = each labeled doc's raw mean
    // log-odds x and calibrated p; fully oracle-checked (betas are
    // bit-identical by the IRLS determinism contract, the scoring
    // expression is the same arithmetic in DuckDB)
    "t27_quality_filter" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 400)
      val junk = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "q$1").as("text"))
      val labeled = docs.withColumn("y", lit(1.0))
        .unionAll(junk.withColumn("y", lit(0.0)))
      graft.text.QualityFilter.fitScore(labeled)
        .select(col("doc_id"), col("y").cast("bigint").as("label"),
          col("x_micro"), col("p_micro"))
        .orderBy("doc_id")
    }),
    // bigram-LM perplexity scoring (t28, graft.text.NgramLm) — the
    // unsupervised CCNet-style quality signal next to t27's supervised
    // classifier: avg negative log likelihood under an add-one bigram
    // model trained on the full documents reference. Scored set = the
    // clean slice plus 'q'-prefixed junk twins (every 5th doc, id +
    // 600000) whose tokens are all OOV — their every bigram degrades
    // to the 1/V floor
    // TEMPERATURE source mixing (t36): p_i ∝ n_i^0.7 sampling weights
    // + per-source budgets for a 100k-doc mix — the XLM-R/mT5
    // low-resource up-weighting table; one (source → count) pass,
    // n^α quantized to micro ints BEFORE any cross-source sum so
    // double summation order never arises (round-8 q6 discipline)
    "t36_temperature_mix" -> ((s, d) =>
      graft.text.SourceMix.temperatureMix(
        table(s, d, "documents"))),
    // per-document n-gram NOVELTY (t37): the memorization/diversity
    // score — share of each doc's distinct trigrams with corpus
    // df = 1; low = boilerplate mass below any pairwise near-dup
    // threshold, high = long-tail content to upweight. Linear df
    // question in place of the quadratic pair question; integer e6
    "t37_ngram_novelty" -> ((s, d) =>
      graft.dedup.Dedup.ngramNovelty(
        table(s, d, "documents").select(col("doc_id"), col("text")))),
    // cross-source n-gram overlap matrix (t38): which sources
    // duplicate each other's content — the mixing diagnostic read
    // before setting t36's weights; full |sources|² matrix with
    // zeros reported, per-gram join fan-out capped by the source
    // dimension, integer e6 containment ratios
    "t38_source_overlap" -> ((s, d) =>
      graft.dedup.Dedup.sourceOverlap(
        table(s, d, "documents").select(col("source"), col("text")))),
    "t28_lm_perplexity" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val clean = docs.select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 400)
      val scored = clean.unionAll(
        clean.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 600000).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", "q$1").as("text")))
      graft.text.NgramLm.avgNll(docs, scored).orderBy("doc_id")
    }),
    // CAPSTONE composed pipeline (t39, round-9 VERDICT ask #7) — the
    // north star's actual claim, operators COMPOSE: t7 clean (exact
    // dedup → lang gate → quality gate → stable sample) → d11
    // near-dup probe of the cleaned additions against the cleaned
    // corpus (planted exact re-deliveries and mutated twins of corpus
    // docs must reject) → t26 target-mixture over sources → t13
    // sequence packing → mm8-style shard manifest. After the dedup
    // stage the pipeline runs on (id, source, fingerprint, n_tokens)
    // metadata — document TEXT never rides a shuffle again
    // (PlanShapeSpec pins the text-bearing exchange count), which is
    // the property that makes the composition viable at 100 TB.
    "t39_capstone_pipeline" -> ((s, d) => t39Pipeline(s, d, None)),
    // DSIR importance-resampling selection (t40, Xie et al. 2023):
    // hashed-bigram likelihood-ratio weights of every raw-pool doc
    // against a curated target slice (here: English docs from three
    // "curated" sources), top-200 kept — the published
    // classifier-free recipe for steering a crawl toward a target
    // domain. λ is ≤ B=4096 rows no matter the corpus size, so
    // scoring is one broadcast join + a doc-grain aggregate and the
    // selection is TakeOrderedAndProject — the pool never sorts
    // globally and its text never shuffles
    "t40_dsir_select" -> ((s, d) =>
      graft.text.Dsir.selectTopK(
        table(s, d, "documents"),
        dsirTarget, k = 200))
  )

  /** t40's target slice: the "curated" corpus DSIR steers toward
    * (shared with the s20 stream gate's offline λ fit). */
  private[queries] val dsirTarget: Column =
    col("lang") === "en" && col("source").isin("src0", "src1", "src2")
  private[queries] val dsirTargetSql: String =
    "lang = 'en' AND source IN ('src0', 'src1', 'src2')"

  /** Bench-scoped workload overrides (see SparkEntry.benchOverrides):
    * the SAME composed pipeline on a quarter of the corpus, passed as
    * an EXPLICIT parameter — Bench times the composition's stage
    * shape, not four times the planted-corpus volume, and the
    * substitution is recorded in the bench artifact instead of hiding
    * behind a JVM-global flag. Verify always runs the full-scale
    * entry. */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    Map("t39_capstone_pipeline" ->
      ((s, d) => t39Pipeline(s, d, Some(1250L))))

  private def t39Pipeline(s: SparkSession, d: String,
      docCap: Option[Long]): DataFrame = {
    {
      import graft.text.TextAnalysis
      val base = table(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val docs = docCap.map(c => base.filter(col("doc_id") < c))
        .getOrElse(base)
      // plant exact duplicates so the clean's dedup stage bites
      val planted = docs.unionAll(docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
      // materialize the cleaned corpus once: it fans out to five
      // downstream references (old + three incoming legs + the probe),
      // and re-expanding the langid/quality expression trees per
      // reference blows the logical plan up combinatorially — exactly
      // what a production pipeline's stage boundary (checkpoint /
      // table write) does between clean and dedup
      val clean = TextAnalysis
        .cleanCorpus(planted, lang = "en", sampleRate = 0.5)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .localCheckpoint()
      val old = clean.filter(col("doc_id") % 2 === 0)
      // incoming = the odd half, plus an exact re-delivery and a
      // mutated twin of corpus (even) docs — both must reject against
      // the probed corpus, proving the near-dup stage bites
      val incoming = clean.filter(col("doc_id") % 2 === 1)
        .unionAll(clean.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 400000).as("doc_id"), col("text"),
            col("lang"), col("source")))
        .unionAll(clean.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" zq"),
              col("doc_id").cast("string"), lit("x")).as("text"),
            col("lang"), col("source")))
      val survivors = graft.dedup.Dedup.incrementalNearDedup(
        old.select(col("doc_id"), col("text")),
        incoming.select(col("doc_id"), col("text")))
      // text ends at the dedup stage: fingerprint + token count
      // compute ROW-LOCALLY off the checkpointed clean, and the
      // survivor selection joins the metadata frame — so no exchange
      // downstream of the probe ever carries document text
      def metaOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("source"),
          TextAnalysis.fingerprint(col("text")).as("__fp"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tokens"))
      // meta is the pipeline's second stage boundary (the first is the
      // checkpointed clean): 4 narrow columns per surviving doc, and
      // every downstream consumer (mixture counts + sample, packing's
      // two-phase cumsum, the shard roll-up) re-expands it into the
      // plan — unmaterialized, the query's physical plan carries ~3.7k
      // nodes and the driver pays seconds of pure optimization time.
      val meta = metaOf(old).unionAll(metaOf(incoming).join(
        survivors.select(col("doc_id")), Seq("doc_id"), "left_semi"))
        .localCheckpoint()
      val mixed = TextAnalysis.targetMixtureSamplePre(meta, "source",
        t39Weights, fpCol = "__fp")
      val packed = TextAnalysis.packSequencesPre(mixed, "source",
        capacity = 512)
      packed
        .groupBy(col("source"), expr("pack_id div 8").as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("pack_id")).as("n_packs"),
          sum(col("n_tokens")).as("shard_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("source", "shard_id")
    }
  }

  /** t39's training-mix weights: ten sources kept at 5:4:4:3:3:2:2:2:
    * 1:1, the other ten dropped (weightless strata drop — the t26
    * contract). */
  private val t39Weights: Map[String, Int] = Map(
    "src0" -> 5, "src1" -> 4, "src2" -> 4, "src3" -> 3, "src4" -> 3,
    "src5" -> 2, "src6" -> 2, "src7" -> 2, "src8" -> 1, "src9" -> 1)

  val oracle: Map[String, String] = Map(
    "t25_readability" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT)
        |      AS n_words,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS INT) AS n_vowel_groups,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |      AS INT) AS n_sentences
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_vowel_groups,
        |  round(CAST('206.835' AS DOUBLE)
        |    - CAST('1.015' AS DOUBLE) *
        |      (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - CAST('84.6' AS DOUBLE) *
        |      (CAST(n_vowel_groups AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    4) AS flesch
        |FROM f WHERE n_words >= 1 ORDER BY doc_id"""
        .stripMargin.replace('\n', ' '),
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
    "t17_bm25_topk" -> TextAnalysis.bm25TopKSql(bm25Query, 10),
    "t23_pmi_collocations" -> TextAnalysis.pmiCollocationsSql(),
    "t29_textrank" -> TextAnalysis.textRankKeywordsSql(),
    "t30_bpe_train" -> graft.text.Bpe.trainMergesSql(),
    "t33_zipf_fit" -> TextAnalysis.zipfFitSql(),
    "t34_heaps_law" -> TextAnalysis.heapsFitSql(),
    "t31_source_kl" -> graft.text.DomainShift.sourceKlSql(),
    "t32_langid_eval" ->
      (s"""WITH p AS (SELECT lang, predicted_lang FROM
         |  (SELECT lang, ${TextAnalysis.langIdSql("text")}
         |   FROM documents)),
         |cm AS (SELECT lang, predicted_lang,
         |    CAST(count(*) AS BIGINT) AS n_docs FROM p GROUP BY 1, 2),
         |t AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang
         |  FROM cm GROUP BY 1)
         |SELECT cm.lang, cm.predicted_lang, cm.n_docs,
         |  CAST(cm.n_docs * 10000 // t.n_lang AS BIGINT) AS share_bp
         |FROM cm JOIN t USING (lang)
         |ORDER BY lang, predicted_lang""".stripMargin
        .replace('\n', ' ')),
    "t19_bigram_logprob" ->
      (TextAnalysis.bigramLogProbSql() + " ORDER BY doc_id"),
    "t18_three_way_split" ->
      (s"""SELECT ${TextAnalysis.threeWaySplitSql("text", 0.05, 0.05)}
         |    AS split,
         |  lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1, 2
         |ORDER BY split, lang""".stripMargin.replace('\n', ' ')),
    "t6_stable_sample" ->
      (s"SELECT doc_id, lang, source, n_chars FROM documents " +
        s"WHERE ${TextAnalysis.stableSampleSql("text", 0.3)} " +
        "ORDER BY doc_id"),
    "t24_weighted_sample" ->
      TextAnalysis.weightedSampleSql("n_chars", 100),
    "t7_corpus_clean" ->
      s"""WITH corpus AS (SELECT doc_id, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 100000, text, lang FROM documents),
         |dedup AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang, min(doc_id) OVER (PARTITION BY
         |      ${TextAnalysis.fingerprintSql("text")}) AS keep_id
         |    FROM corpus)
         |  WHERE doc_id = keep_id),
         |scored AS (
         |  SELECT doc_id, text, lang, ${TextAnalysis.langIdSql("text")},
         |    ${TextAnalysis.qualityFeaturesSql("text")}
         |  FROM dedup)
         |SELECT doc_id, lang, predicted_lang, n_tokens, n_chars_actual
         |FROM scored
         |WHERE predicted_lang = 'en' AND is_quality
         |  AND ${TextAnalysis.stableSampleSql("text", 0.5)}
         |ORDER BY doc_id""".stripMargin.replace('\n', ' '),
    "t8_stratified_sample" ->
      (s"SELECT doc_id, lang, source, n_chars FROM documents " +
        s"WHERE ${TextAnalysis.stratifiedSampleSql("lang", "text",
          Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.25), 0.1)} " +
        "ORDER BY doc_id"),
    "t26_target_mixture" ->
      (s"SELECT doc_id, lang, source, n_chars FROM (" +
        TextAnalysis.targetMixtureSampleSql("lang",
          Map("en" -> 5, "de" -> 2, "fr" -> 2, "zh" -> 1)) +
        ") ORDER BY doc_id"),
    "t9_repetition" ->
      (s"SELECT doc_id, ${TextAnalysis.repetitionSql("text")} " +
        "FROM documents ORDER BY doc_id"),
    "t10_token_budget" ->
      (s"SELECT doc_id, lang, source, n_tokens, cum_tokens FROM (" +
        TextAnalysis.tokenBudgetSampleSql("lang",
          Map("en" -> 6000L), 2000L) + ") ORDER BY doc_id"),
    "t12_pii_scrub" ->
      s"""WITH dirty AS (
         |  SELECT doc_id,
         |    text
         |    || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id
         |        || '@' || source || '.com' ELSE '' END)
         |    || (CASE WHEN doc_id % 4 = 0 THEN ' call +1-555-'
         |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |        ELSE '' END)
         |    || (CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.'
         |        || (doc_id % 256) || '.' || (doc_id * 7 % 256)
         |        ELSE '' END) AS text
         |  FROM documents)
         |SELECT doc_id, ${TextAnalysis.piiScrubSql("text")}
         |FROM dirty ORDER BY doc_id""".stripMargin.replace('\n', ' '),
    "t13_pack_sequences" ->
      (s"SELECT doc_id, lang, source, n_tokens, pack_id, offset_in_pack, " +
        "crosses_boundary FROM (" +
        TextAnalysis.packSequencesSql("source", 512) + ") ORDER BY doc_id"),
    "t14_chunk_overlap" ->
      (TextAnalysis.chunkOverlapSql(64, 48) +
        " ORDER BY doc_id, chunk_id"),
    // chr(769)=U+0301 combining acute, chr(776)=U+0308 combining
    // diaeresis; chr(233)=é, chr(239)=ï precomposed
    "t15_unicode_normalize" ->
      """WITH dirty AS (
        |  SELECT doc_id, text ||
        |    (CASE WHEN doc_id % 2 = 0
        |      THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |      ELSE ' caf' || chr(233) || ' na' || chr(239) || 've'
        |     END) AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS text_nfc,
        |  nfc_normalize(t) != t AS changed
        |FROM dirty ORDER BY doc_id""".stripMargin.replace('\n', ' '),
    "t16_unigram_logprob" ->
      (TextAnalysis.unigramLogProbSql() + " ORDER BY doc_id"),
    // quality/langid and repetition fragments both emit n_tokens →
    // separate CTEs joined on doc_id, qualified references
    "t11_corpus_stats" ->
      s"""WITH q AS (SELECT doc_id, source, lang,
         |    ${TextAnalysis.langIdSql("text")},
         |    ${TextAnalysis.qualityFeaturesSql("text")}
         |  FROM documents),
         |r AS (SELECT doc_id, ${TextAnalysis.repetitionSql("text")}
         |  FROM documents)
         |SELECT q.source, q.lang, count(*) AS n_docs,
         |  CAST(sum(r.n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(CAST(q.stopword_ratio AS DECIMAL(8,4))) AS DOUBLE)
         |    AS sum_stopword_ratio,
         |  CAST(sum(CASE WHEN q.is_quality THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality,
         |  CAST(sum(CASE WHEN r.is_repetitive THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_repetitive,
         |  CAST(sum(CASE WHEN q.predicted_lang = q.lang THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_lang_match
         |FROM q JOIN r USING (doc_id)
         |GROUP BY 1, 2 ORDER BY source, lang"""
        .stripMargin.replace('\n', ' '),
    // same hashed-bucket log-odds model + per-doc DECIMAL-summed mean,
    // fed through the identical unrolled IRLS and scored under the
    // final betas (graft.ml.LogisticIrls.irlsScoredSql)
    "t27_quality_filter" -> {
      val norm = TextAnalysis.normalizedSql("text")
      val dataSql =
        s"""WITH labeled AS (
           |  SELECT doc_id, text, CAST('1' AS DOUBLE) AS y
           |  FROM documents WHERE doc_id < 400
           |  UNION ALL SELECT doc_id + 500000,
           |    regexp_replace(text, '(\\S+)', 'q\\1', 'g'),
           |    CAST('0' AS DOUBLE)
           |  FROM documents WHERE doc_id < 400 AND doc_id % 3 = 0),
           |toks AS (SELECT doc_id, y,
           |    unnest(regexp_split_to_array(trim($norm), '\\s+')) AS tok
           |  FROM labeled),
           |bt AS (SELECT doc_id, y,
           |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) % 64
           |      AS idx,
           |    count(*) AS c FROM toks GROUP BY 1, 2, 3),
           |cls AS (SELECT idx,
           |    CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT)
           |      AS pos_b,
           |    CAST(sum(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT)
           |      AS neg_b
           |  FROM bt GROUP BY 1),
           |tot AS (SELECT sum(pos_b) AS pos_tot, sum(neg_b) AS neg_tot
           |  FROM cls),
           |mdl AS (SELECT idx, CAST(round(ln(
           |    CAST((pos_b + 1) * (neg_tot + 64) AS DOUBLE) /
           |    CAST((neg_b + 1) * (pos_tot + 64) AS DOUBLE))
           |    * CAST('1000000' AS DOUBLE)) AS BIGINT) AS w_micro
           |  FROM cls CROSS JOIN tot),
           |ds AS (SELECT doc_id, max(y) AS y,
           |    CAST(sum(c * w_micro) AS BIGINT) AS ts,
           |    CAST(sum(c) AS BIGINT) AS n
           |  FROM bt JOIN mdl USING (idx) GROUP BY doc_id),
           |dx AS (SELECT doc_id, y,
           |    CAST(CASE WHEN ts >= 0 THEN ts // n
           |      ELSE -((-ts) // n) END AS BIGINT) AS x_micro
           |  FROM ds)
           |SELECT doc_id, y, x_micro,
           |  CAST(x_micro AS DOUBLE) / CAST('1000000' AS DOUBLE) AS x
           |FROM dx"""
          .stripMargin.replace('\n', ' ')
      val scored = graft.ml.LogisticIrls.irlsScoredSql(
        dataSql, Seq("doc_id", "x_micro"), iters = 3)
      s"""SELECT doc_id, CAST(y AS BIGINT) AS label, x_micro, p_micro
         |FROM ($scored) ORDER BY doc_id"""
        .stripMargin.replace('\n', ' ')
    },
    "t36_temperature_mix" ->
      graft.text.SourceMix.temperatureMixSql(),
    "t37_ngram_novelty" -> graft.dedup.Dedup.ngramNoveltySql(
      "(SELECT doc_id AS id, text FROM documents)"),
    "t38_source_overlap" -> graft.dedup.Dedup.sourceOverlapSql(
      "(SELECT source AS src, text FROM documents)"),
    // same add-one bigram model: vocabulary-bounded count tables from
    // the full reference, per-bigram -ln terms as one double division
    // of exact integers rounded to 6dp, DECIMAL-summed per doc
    "t28_lm_perplexity" -> {
      val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
      s"""WITH scored AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 400
         |  UNION ALL SELECT doc_id + 600000,
         |    regexp_replace(text, '(\\S+)', 'q\\1', 'g')
         |  FROM documents WHERE doc_id < 400 AND doc_id % 5 = 0),
         |rt AS (SELECT $toks AS t FROM documents),
         |cu AS (SELECT w1, count(*) AS cu FROM (
         |    SELECT unnest(t) AS w1 FROM rt) GROUP BY 1),
         |vv AS (SELECT count(*) AS v FROM cu),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM (
         |    SELECT t[i] AS w1, t[i + 1] AS w2
         |    FROM rt, unnest(range(1, len(t))) AS u(i)
         |    WHERE len(t) >= 2) GROUP BY 1, 2),
         |db AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, $toks AS t FROM scored) s,
         |    unnest(range(1, len(t))) AS u(i)
         |  WHERE len(t) >= 2),
         |terms AS (SELECT doc_id,
         |    CAST(round(-ln(CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE) /
         |      CAST(coalesce(cu.cu, 0) + v AS DOUBLE)) * 1000000)
         |      AS BIGINT) AS nll
         |  FROM db LEFT JOIN cb USING (w1, w2)
         |  LEFT JOIN cu USING (w1) CROSS JOIN vv),
         |ag AS (SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS s
         |  FROM terms GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST(CASE WHEN s >= 0 THEN s // n_bigrams
         |    ELSE -((-s) // n_bigrams) END AS BIGINT) AS avg_nll_micro
         |FROM ag ORDER BY doc_id"""
        .stripMargin.replace('\n', ' ')
    },
    // the whole capstone replayed: clean (t7 fragments), ground-truth
    // all-pairs near-dup rejection (the d11 oracle discipline — no
    // LSH oracle-side, so green certifies band recall too), t26
    // mixture arithmetic, t13 packing window, shard roll-up
    "t39_capstone_pipeline" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      val norm = TextAnalysis.normalizedSql("text")
      val toks = TextAnalysis.tokensSql("text")
      val sh = "list_distinct([substr(n, i, 5) " +
        "for i in range(1, greatest(len(n) - 4, 1) + 1)])"
      val wCase = t39Weights.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN source = '$s' THEN $w" }
        .mkString("(CASE ", " ", " ELSE NULL END)")
      s"""WITH planted AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  UNION ALL SELECT doc_id + 100000, text, lang, source
         |    FROM documents WHERE doc_id % 7 = 0),
         |dedup AS (SELECT doc_id, text, lang, source FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY $fp) AS keep_id
         |    FROM planted)
         |  WHERE doc_id = keep_id),
         |scoredc AS (SELECT doc_id, text, lang, source,
         |    ${TextAnalysis.langIdSql("text")},
         |    ${TextAnalysis.qualityFeaturesSql("text")}
         |  FROM dedup),
         |clean AS (SELECT doc_id, text, lang, source FROM scoredc
         |  WHERE predicted_lang = 'en' AND is_quality
         |    AND ${TextAnalysis.stableSampleSql("text", 0.5)}),
         |old AS (SELECT * FROM clean WHERE doc_id % 2 = 0),
         |incoming AS (SELECT * FROM clean WHERE doc_id % 2 = 1
         |  UNION ALL SELECT doc_id + 400000, text, lang, source
         |    FROM clean WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 500000,
         |    text || ' zq' || CAST(doc_id AS VARCHAR) || 'x',
         |    lang, source
         |    FROM clean WHERE doc_id % 10 = 4),
         |csh AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM old)),
         |ish AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM incoming)),
         |rej AS (SELECT DISTINCT i.doc_id FROM ish i JOIN csh c
         |  ON CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
         |     / CAST(len(list_distinct(i.s || c.s)) AS DOUBLE)
         |     >= 0.7),
         |surv AS (SELECT min(doc_id) AS doc_id FROM (
         |    SELECT doc_id, $fp AS fpp FROM incoming
         |    WHERE doc_id NOT IN (SELECT doc_id FROM rej))
         |  GROUP BY fpp),
         |finalc AS (SELECT * FROM old UNION ALL
         |  SELECT i.* FROM incoming i JOIN surv sv
         |    ON sv.doc_id = i.doc_id),
         |meta AS (SELECT doc_id, source, $fp AS fp,
         |    CAST(len($toks) AS BIGINT) AS n_tokens FROM finalc),
         |ww AS (SELECT *, $wCase AS w FROM meta
         |  WHERE $wCase IS NOT NULL),
         |cnt AS (SELECT source AS stratum, count(*) AS n, max(w) AS wt
         |  FROM ww GROUP BY 1),
         |m AS (SELECT stratum AS m_stratum, n AS m_n, wt AS m_w
         |  FROM cnt a WHERE NOT EXISTS (SELECT 1 FROM cnt b
         |    WHERE b.n * a.wt < a.n * b.wt
         |      OR (b.n * a.wt = a.n * b.wt AND b.stratum < a.stratum))),
         |mixed AS (SELECT ww.doc_id, ww.source, ww.fp, ww.n_tokens
         |  FROM ww JOIN cnt ON ww.source = cnt.stratum CROSS JOIN m
         |  WHERE CAST(CAST(('0x' || substr(fp, 1, 4)) AS BIGINT)
         |      AS DECIMAL(5,0))
         |      * CAST(m_w AS DECIMAL(7,0)) * CAST(n AS DECIMAL(15,0))
         |    < CAST(65536 AS DECIMAL(6,0)) * CAST(wt AS DECIMAL(7,0))
         |      * CAST(m_n AS DECIMAL(15,0))),
         |pk AS (SELECT doc_id, source, n_tokens,
         |    CAST((cum_tokens - n_tokens) // 512 AS BIGINT) AS pack_id
         |  FROM (SELECT *, CAST(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY fp, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tokens
         |    FROM mixed))
         |SELECT source, pack_id // 8 AS shard_id,
         |  count(*) AS n_docs,
         |  count(DISTINCT pack_id) AS n_packs,
         |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM pk GROUP BY 1, 2
         |ORDER BY source, shard_id""".stripMargin.replace('\n', ' ')
    },
    "t40_dsir_select" ->
      graft.text.Dsir.selectTopKSql(dsirTargetSql, k = 200)
  )
}
