package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, language ID, token statistics, fingerprinting.
  * All are narrow per-row transforms (no shuffle, fully codegen'd —
  * they run at parquet-scan speed on any cluster size).
  *
  * Each operator has a DuckDB SQL twin generated from the same token
  * lists / regexes, so the oracle gate covers them.
  */
object TextAnalysis {

  /** Whitespace tokenizer — the shared definition for every operator. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  val tokensSql: String => String =
    t => s"regexp_split_to_array(trim($t), '\\s+')"

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation. */
  val bpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // ------------------------------------------------------- quality scoring

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-document quality features: lengths, ratios, stopword share.
    * (Heuristics in the C4/Gopher style: length bounds + symbol ratios.) */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t)
    val nTokens = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .withColumn("n_chars_actual", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        round(nChars.cast("double") / greatest(nTokens, lit(1)), 4))
      .withColumn("digit_ratio", round(
        (nChars - length(regexp_replace(t, "[0-9]", ""))).cast("double") /
          greatest(nChars, lit(1)), 4))
      .withColumn("punct_ratio", round(
        (nChars - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") /
          greatest(nChars, lit(1)), 4))
      .withColumn("stopword_ratio", round(
        size(filter(toks, tk => array_contains(stopArr, tk))).cast("double") /
          greatest(nTokens, lit(1)), 4))
      .withColumn("is_quality",
        nTokens >= 10 && nTokens <= 100000 &&
          col("punct_ratio") < 0.3 && col("digit_ratio") < 0.3)
  }

  /** DuckDB twin of [[qualityFeatures]] as a SELECT-list fragment. */
  def qualityFeaturesSql(t: String): String = {
    val toks = tokensSql(t)
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""CAST(length($t) AS INT) AS n_chars_actual,
       |  CAST(len($toks) AS INT) AS n_tokens,
       |  round(CAST(length($t) AS DOUBLE)
       |    / greatest(len($toks), 1), 4) AS avg_token_len,
       |  round(CAST(length($t) - length(regexp_replace($t, '[0-9]', '', 'g'))
       |    AS DOUBLE) / greatest(length($t), 1), 4) AS digit_ratio,
       |  round(CAST(length($t) - length(regexp_replace($t, '[.,!?;:]', '', 'g'))
       |    AS DOUBLE) / greatest(length($t), 1), 4) AS punct_ratio,
       |  round(CAST(len(list_filter($toks,
       |    tk -> list_contains($stopList, tk))) AS DOUBLE)
       |    / greatest(len($toks), 1), 4) AS stopword_ratio,
       |  len($toks) >= 10 AND len($toks) <= 100000
       |    AND round(CAST(length($t) - length(regexp_replace($t, '[.,!?;:]', '', 'g'))
       |      AS DOUBLE) / greatest(length($t), 1), 4) < 0.3
       |    AND round(CAST(length($t) - length(regexp_replace($t, '[0-9]', '', 'g'))
       |      AS DOUBLE) / greatest(length($t), 1), 4) < 0.3 AS is_quality"""
      .stripMargin.replace('\n', ' ')
  }

  // ----------------------------------------------------------- language ID

  /** Tiny per-language marker lexicons (n-gram-heuristic stand-in; the
    * architecture point is the scoring pipeline, not lexicon quality). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it"),
    "es" -> Seq("el", "la", "los", "las", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "que", "est", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"))

  /** Language-ID scores + argmax prediction. Tie-break: language earlier
    * in reverse-alphabetical CASE order wins — fixed chain shared with
    * the SQL twin. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = langMarkers.foldLeft(docs) { case (df, (lang, markers)) =>
      val arr = array(markers.map(lit): _*)
      df.withColumn(s"score_$lang",
        size(filter(toks, tk => array_contains(arr, tk))))
    }
    val langs = langMarkers.map(_._1)
    val predicted = langs.reverse
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, l) => when(isMax(l, langs), lit(l))
        case (acc, l)  => acc.when(isMax(l, langs), lit(l))
      }
      .otherwise(lit(langs.head))
    scored.withColumn("predicted_lang", predicted)
  }

  private def isMax(l: String, langs: Seq[String]): Column =
    langs.filter(_ != l)
      .map(o => col(s"score_$l") >= col(s"score_$o"))
      .reduce(_ && _)

  /** DuckDB twin: same scores + the same reverse-order argmax chain.
    * Emits a full SELECT over `documents`-shaped input named `d`. */
  def langIdSql(t: String): String = {
    val toks = tokensSql(s"lower($t)")
    val scores = langMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString("[", ", ", "]")
      s"CAST(len(list_filter($toks, tk -> list_contains($list, tk))) AS INT)" +
        s" AS score_$lang"
    }.mkString(", ")
    val langs = langMarkers.map(_._1)
    val whens = langs.reverse.map { l =>
      val cond = langs.filter(_ != l)
        .map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"$scores, (CASE $whens ELSE '${langs.head}' END) AS predicted_lang"
  }

  // ------------------------------------------------------ token statistics

  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ws = tokens(t)
    val bpe = regexp_extract_all(t, lit(bpeRegex), lit(0))
    docs
      .withColumn("n_ws_tokens", size(ws))
      .withColumn("n_bpe_tokens", size(bpe))
      .withColumn("n_unique_tokens", size(array_distinct(ws)))
  }

  def tokenStatsSql(t: String): String = {
    val toks = tokensSql(t)
    s"""CAST(len($toks) AS INT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all($t, '$bpeRegex')) AS INT)
       |    AS n_bpe_tokens,
       |  CAST(len(list_distinct($toks)) AS INT) AS n_unique_tokens"""
      .stripMargin.replace('\n', ' ')
  }

  // -------------------------------------------------------- fingerprinting

  /** Canonical normalization: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  val normalizedSql: String => String =
    t => s"trim(regexp_replace(lower($t), '\\s+', ' ', 'g'))"

  /** Content fingerprint = md5 of the normalized text (stable across
    * engines; xxhash64 variant exists Spark-side for joins/dedup). */
  def fingerprint(text: Column): Column =
    md5(normalized(text).cast("binary"))

  def fingerprintSql(t: String): String = s"md5(${normalizedSql(t)})"

  /** SQL string-literal escape for values interpolated into generated
    * oracle SQL (stratum names, budgets keys): doubles embedded single
    * quotes so a value like "o'brien" cannot produce malformed SQL. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** 64-bit fast fingerprint for shuffle keys (Spark-side only). */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  // ------------------------------------------------- stable hash sampling

  /** Deterministic content-hash sampling (CCNet/C4-style): keep a doc iff
    * the first 16 bits of its content fingerprint fall below
    * `rate · 2¹⁶`. No RNG state, reproducible across engines and runs,
    * and duplicate texts always land on the same side of the cut —
    * sampling composes correctly with dedup. Pure filter: no shuffle,
    * pushes to the scan boundary. */
  def stableSample(docs: DataFrame, textCol: String,
      rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate out of [0,1]: $rate")
    docs.filter(
      substring(fingerprint(col(textCol)), 1, 4) < lit(sampleCut(rate)))
  }

  private def sampleCut(rate: Double): String = {
    val cut = math.round(rate * 65536).toInt
    // cut > 0xffff must keep EVERY doc: "10000" would sort before "ffff"
    // lexicographically; "g" sorts after every hex digit.
    if (cut > 0xffff) "g" else f"$cut%04x"
  }

  /** DuckDB twin of the [[stableSample]] predicate. */
  def stableSampleSql(t: String, rate: Double): String =
    s"substr(${fingerprintSql(t)}, 1, 4) < '${sampleCut(rate)}'"

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, log-priority form): each row gets priority
    * ln(u)/w from its content-hash unit value u ∈ (0,1) and weight w;
    * the top-k priorities ARE a w-proportional sample. Same RNG-free
    * contract as [[stableSample]] — reproducible across engines, runs,
    * and partitionings — but inclusion probability scales with the
    * weight (sample long documents more; the token-budget analogue of
    * importance sampling in mixture building).
    *
    * Scale: priority is a pure per-row expression on the scan; the cut
    * is TakeOrderedAndProject under the (priority DESC, id) total order
    * — no global sort, no RNG state. Priorities round to 6 dp before
    * ordering so an ulp of libm ln() divergence can never flip the
    * selected set between engines. */
  def weightedSample(docs: DataFrame, textCol: String, weightCol: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    val h = conv(substring(fingerprint(col(textCol)), 1, 4), 16, 10)
      .cast("long")
    val u = (h + 1).cast("double") / lit(65537.0d)
    docs
      .withColumn("priority",
        round(log(u) / col(weightCol).cast("double"), 6))
      .select(col(idCol), col("source"), col(weightCol), col("priority"))
      .orderBy(desc("priority"), col(idCol)).limit(k)
  }

  /** DuckDB twin of [[weightedSample]] over `documents`. */
  def weightedSampleSql(weightCol: String, k: Int): String = {
    val fp = fingerprintSql("text")
    s"""SELECT doc_id, source, $weightCol,
       |  round(ln(CAST(CAST(('0x' || substr($fp, 1, 4)) AS INT) + 1
       |      AS DOUBLE) / CAST('65537' AS DOUBLE))
       |    / CAST($weightCol AS DOUBLE), 6) AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id LIMIT $k"""
      .stripMargin.replace('\n', ' ')
  }

  /** Deterministic train/val/test split on the same content-hash order
    * as [[stableSample]]: a document's split follows its TEXT, so exact
    * duplicates land in the same split (no train/test leakage through
    * dup pairs), re-runs are reproducible without RNG state, and the
    * assignment is a pure pushable per-row expression. */
  def threeWaySplit(docs: DataFrame, textCol: String,
      valRate: Double, testRate: Double): DataFrame = {
    require(valRate >= 0 && testRate >= 0 && valRate + testRate <= 1,
      s"invalid rates: val=$valRate test=$testRate")
    val prefix = substring(fingerprint(col(textCol)), 1, 4)
    docs.withColumn("split",
      when(prefix < lit(sampleCut(1 - valRate - testRate)), "train")
        .when(prefix < lit(sampleCut(1 - testRate)), "val")
        .otherwise("test"))
  }

  /** DuckDB twin of the [[threeWaySplit]] assignment expression. */
  def threeWaySplitSql(t: String, valRate: Double,
      testRate: Double): String = {
    val p = s"substr(${fingerprintSql(t)}, 1, 4)"
    s"""CASE WHEN $p < '${sampleCut(1 - valRate - testRate)}' THEN 'train'
       |  WHEN $p < '${sampleCut(1 - testRate)}' THEN 'val'
       |  ELSE 'test' END""".stripMargin.replace('\n', ' ')
  }

  /** Stratified stable sampling: a per-stratum rate (training mixes keep
    * languages/sources at different proportions). Same content-hash cut
    * as [[stableSample]], so it stays RNG-free, dedup-aligned, and a pure
    * pushable filter — the stratum column only selects WHICH cut applies.
    * Strata absent from `rates` use `defaultRate`. */
  def stratifiedSample(docs: DataFrame, strataCol: String, textCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0 && r <= 1, s"rate out of [0,1]: $r"))
    val cut = rates.toSeq.sortBy(_._1)
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, (s, r)) => when(col(strataCol) === s, lit(sampleCut(r)))
        case (acc, (s, r))  => acc.when(col(strataCol) === s, lit(sampleCut(r)))
      } match {
        // empty rates map: every stratum takes the default
        case null => lit(sampleCut(defaultRate))
        case acc  => acc.otherwise(lit(sampleCut(defaultRate)))
      }
    docs.filter(substring(fingerprint(col(textCol)), 1, 4) < cut)
  }

  /** DuckDB twin of the [[stratifiedSample]] predicate. */
  def stratifiedSampleSql(strataCol: String, t: String,
      rates: Map[String, Double], defaultRate: Double): String = {
    val whens = rates.toSeq.sortBy(_._1)
      .map { case (s, r) =>
        s"WHEN $strataCol = '${sqlLit(s)}' THEN '${sampleCut(r)}'" }
      .mkString(" ")
    s"substr(${fingerprintSql(t)}, 1, 4) < " +
      s"(CASE $whens ELSE '${sampleCut(defaultRate)}' END)"
  }

  // --------------------------------------------- target-mixture balancing

  /** Water-filling mixture balancer: down-sample each stratum so the
    * achieved corpus hits integer target proportions `weights` (e.g.
    * en:de:fr:zh = 5:2:2:1) while keeping the LARGEST such corpus — no
    * stratum up-samples, so the binding stratum (smallest nᵈ/wᵈ) keeps
    * 100% and every other keeps rate (n_m/w_m)·wᵈ/nᵈ. This is t8's
    * missing half: t8 takes rates as GIVEN; real mixture building
    * derives them from the target and what the corpus actually holds.
    * Strata absent from `weights` are dropped (weight 0).
    *
    * Determinism: acceptance is the pure INTEGER test
    * `h·w_m·nᵈ < 65536·wᵈ·n_m` on the 16-bit content-hash prefix h,
    * evaluated in bounded decimals ((5,0)·(7,0)·(15,0) — exact and
    * overflow-free in both engines), so no division, no doubles, no
    * engine-specific rounding anywhere; like [[stableSample]] the kept
    * set follows document CONTENT (dedup-aligned, partition-invariant).
    * The binding stratum is chosen by |D|² exact rational
    * cross-comparisons (nᵃ·wᵇ vs nᵇ·wᵃ) on the metadata-sized count
    * table, min-stratum tie-break.
    *
    * Scale: one partial-aggregatable count pass, then a scan-speed
    * predicate under broadcast joins of the |D|-row count table and the
    * 1-row binding stratum — the corpus never shuffles. */
  def targetMixtureSample(docs: DataFrame, strataCol: String,
      textCol: String, weights: Map[String, Int]): DataFrame =
    targetMixtureSamplePre(
      docs.withColumn("__mixfp", fingerprint(col(textCol))),
      strataCol, weights, fpCol = "__mixfp").drop("__mixfp")

  /** [[targetMixtureSample]] over a PRECOMPUTED content fingerprint —
    * the t39 composition path: once the capstone pipeline has reduced
    * documents to (id, strata, fingerprint, n_tokens) metadata after
    * its dedup stage, the mixture runs on the narrow frame and text
    * never rides another operator. */
  def targetMixtureSamplePre(docs: DataFrame, strataCol: String,
      weights: Map[String, Int], fpCol: String): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(w => w > 0 && w <= 1000000),
      s"weights must be in [1, 1e6]: $weights")
    val wChain = weights.toSeq.sortBy(_._1)
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, (s, w)) => when(col(strataCol) === s, lit(w.toLong))
        case (acc, (s, w))  => acc.when(col(strataCol) === s, lit(w.toLong))
      }
    val withW = docs.withColumn("_w", wChain).filter(col("_w").isNotNull)
    val counts = withW.groupBy(col(strataCol).as("_stratum"))
      .agg(count(lit(1)).as("_n"), max(col("_w")).as("_wt"))
    // binding stratum: no other stratum has a strictly smaller n/w
    // (or an equal one with a smaller name)
    val binding = counts.alias("a")
      .join(counts.alias("b"),
        col("b._n") * col("a._wt") < col("a._n") * col("b._wt") ||
          (col("b._n") * col("a._wt") === col("a._n") * col("b._wt") &&
            col("b._stratum") < col("a._stratum")),
        "left_anti")
      .select(col("_stratum").as("_m_stratum"), col("_n").as("_m_n"),
        col("_wt").as("_m_w"))
    val h = conv(substring(col(fpCol), 1, 4), 16, 10)
      .cast("decimal(5,0)")
    withW
      .join(broadcast(counts), col(strataCol) === col("_stratum"))
      .crossJoin(broadcast(binding))
      .filter(
        h * col("_m_w").cast("decimal(7,0)") *
          col("_n").cast("decimal(15,0)") <
        lit(65536).cast("decimal(6,0)") *
          col("_wt").cast("decimal(7,0)") *
          col("_m_n").cast("decimal(15,0)"))
      .drop("_w", "_stratum", "_n", "_wt",
        "_m_stratum", "_m_n", "_m_w")
  }

  /** DuckDB twin of [[targetMixtureSample]] over `documents`: emits the
    * kept rows (same integer acceptance test, same decimal widths). */
  def targetMixtureSampleSql(strataCol: String,
      weights: Map[String, Int]): String = {
    val wCase = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN $strataCol = '${sqlLit(s)}' THEN $w" }
      .mkString("(CASE ", " ", " ELSE NULL END)")
    val h = s"CAST(('0x' || substr(${fingerprintSql("text")}, 1, 4)) " +
      "AS BIGINT)"
    s"""WITH ww AS (SELECT *, $wCase AS w FROM documents
       |  WHERE $wCase IS NOT NULL),
       |cnt AS (SELECT $strataCol AS stratum, count(*) AS n, max(w) AS wt
       |  FROM ww GROUP BY 1),
       |m AS (SELECT stratum AS m_stratum, n AS m_n, wt AS m_w
       |  FROM cnt a WHERE NOT EXISTS (SELECT 1 FROM cnt b
       |    WHERE b.n * a.wt < a.n * b.wt
       |      OR (b.n * a.wt = a.n * b.wt AND b.stratum < a.stratum)))
       |SELECT ww.* EXCLUDE (w)
       |FROM ww JOIN cnt ON ww.$strataCol = cnt.stratum CROSS JOIN m
       |WHERE CAST($h AS DECIMAL(5,0)) * CAST(m_w AS DECIMAL(7,0))
       |    * CAST(n AS DECIMAL(15,0))
       |  < CAST(65536 AS DECIMAL(6,0)) * CAST(wt AS DECIMAL(7,0))
       |    * CAST(m_n AS DECIMAL(15,0))""".stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------------- token-budget sampling

  /** Token-budget sampling: per stratum (language/source), keep the
    * greedy prefix of documents — in content-fingerprint order, so the
    * choice is deterministic, RNG-free, and stable across runs — whose
    * cumulative token count stays within the stratum's budget. This is
    * how training mixes are actually specified ("200 B tokens of web,
    * 30 B of code"): a budget per source, not a rate.
    *
    * The running total uses [[graft.etl.Ids.keyedCumsum]] — the
    * two-phase offsets shape — because a plain per-stratum window would
    * funnel each stratum through one task (strata are low-cardinality:
    * this must scale by DATA size, not key count). Ties in the
    * fingerprint order are broken by id so the kept SET is exact. */
  def tokenBudgetSample(docs: DataFrame, strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withTok = docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
    val cum = graft.etl.Ids.keyedCumsum(withTok, strataCol,
      Seq("__fp", idCol), "n_tokens", "cum_tokens")
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, (s, b)) => when(col(strataCol) === s, lit(b))
        case (acc, (s, b))  => acc.when(col(strataCol) === s, lit(b))
      } match {
        // empty budgets map: every stratum takes the default
        case null => lit(defaultBudget)
        case acc  => acc.otherwise(lit(defaultBudget))
      }
    cum.filter(col("cum_tokens") <= budget).drop("__fp")
  }

  /** DuckDB twin of [[tokenBudgetSample]] over `documents` (single-task
    * window is fine oracle-side — the oracle runs at test scale). */
  def tokenBudgetSampleSql(strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long): String = {
    val toks = tokensSql("text")
    val whens = budgets.toSeq.sortBy(_._1)
      .map { case (s, b) => s"WHEN $strataCol = '${sqlLit(s)}' THEN $b" }
      .mkString(" ")
    s"""SELECT * FROM (
       |  SELECT doc_id, lang, source,
       |    CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(len($toks) AS BIGINT)) OVER (
       |      PARTITION BY $strataCol
       |      ORDER BY ${fingerprintSql("text")}, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_tokens
       |  FROM documents)
       |WHERE cum_tokens <= (CASE $whens ELSE $defaultBudget END)"""
      .stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------- repetition scoring

  /** Gopher-style repetition gates (Rae et al. '21 §A1.1): duplicate-word
    * fraction, most-frequent-word share, and duplicate-bigram fraction
    * over the normalized token stream. Repetitious text (boilerplate,
    * keyword stuffing, generation loops) scores high and is gated out.
    *
    * Pure per-row array math — no shuffle, no UDF; like the other quality
    * gates it runs at parquet-scan speed at any corpus size. Token counts
    * per document are bounded (docs, not corpora), so the per-row
    * distinct/filter loops are O(len·vocab) on short arrays, not a
    * scale concern. */
  def repetitionFeatures(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    // Materialize the token array (and its distinct set / bigram list)
    // as real columns BEFORE any lambda references them: higher-order
    // functions evaluate interpreted and re-compute child expressions
    // per element, so an inlined split-regex would re-tokenize the text
    // at every position. Each temp is referenced more than once, which
    // stops CollapseProject from inlining the non-cheap expressions.
    val withToks = docs
      .withColumn("__toks", tokens(normalized(col(textCol))))
      .withColumn("__utoks", array_distinct(col("__toks")))
      .withColumn("__bigrams", when(size(col("__toks")) >= 2,
        // length-1 docs have none (sequence(1,0) would count DOWN)
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1))))
        .otherwise(array().cast("array<string>")))
    val n = size(col("__toks"))
    val maxFreq = array_max(transform(col("__utoks"),
      x => size(filter(col("__toks"), y => y === x))))
    withToks
      .withColumn("n_tokens", n)
      .withColumn("dup_word_frac", round(
        lit(1) - size(col("__utoks")).cast("double") /
          greatest(n, lit(1)), 4))
      .withColumn("top_word_frac", round(
        maxFreq.cast("double") / greatest(n, lit(1)), 4))
      .withColumn("dup_bigram_frac", round(
        lit(1) - size(array_distinct(col("__bigrams"))).cast("double") /
          greatest(size(col("__bigrams")), lit(1)), 4))
      .withColumn("is_repetitive",
        col("dup_word_frac") > 0.6 || col("top_word_frac") > 0.15 ||
          col("dup_bigram_frac") > 0.08)
      .drop("__toks", "__utoks", "__bigrams")
  }

  /** DuckDB twin of [[repetitionFeatures]] as a SELECT-list fragment. */
  def repetitionSql(t: String): String = {
    val toks = tokensSql(normalizedSql(t))
    val bigrams = s"""(CASE WHEN len($toks) >= 2 THEN
       |    [list_extract($toks, i) || ' ' || list_extract($toks, i + 1)
       |      for i in range(1, len($toks))]
       |    ELSE []::VARCHAR[] END)""".stripMargin.replace('\n', ' ')
    val dw = s"round(1 - CAST(len(list_distinct($toks)) AS DOUBLE)" +
      s" / greatest(len($toks), 1), 4)"
    val tw = s"round(CAST(list_max(list_transform(list_distinct($toks)," +
      s" x -> len(list_filter($toks, y -> y = x)))) AS DOUBLE)" +
      s" / greatest(len($toks), 1), 4)"
    val db = s"round(1 - CAST(len(list_distinct($bigrams)) AS DOUBLE)" +
      s" / greatest(len($bigrams), 1), 4)"
    s"""CAST(len($toks) AS INT) AS n_tokens,
       |  $dw AS dup_word_frac,
       |  $tw AS top_word_frac,
       |  $db AS dup_bigram_frac,
       |  ($dw > 0.6 OR $tw > 0.15 OR $db > 0.08) AS is_repetitive"""
      .stripMargin.replace('\n', ' ')
  }

  // -------------------------------------------------- composed corpus clean

  /** The composed C4-style cleaning pipeline — the operators above chained
    * in production order: exact dedup → language gate → quality gate →
    * stable down-sample. Everything after the dedup shuffle is a pure
    * per-row filter, so the whole clean is ONE shuffle (the fingerprint
    * min-id aggregate) regardless of corpus size. */
  def cleanCorpus(docs: DataFrame, lang: String = "en",
      sampleRate: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val deduped = graft.dedup.Dedup.dropExactDuplicates(docs, idCol, textCol)
    val gated = qualityFeatures(langId(deduped, textCol), textCol)
      .filter(col("predicted_lang") === lang && col("is_quality"))
    stableSample(gated, textCol, sampleRate)
  }

  // ---------------------------------------------------------------- TF-IDF

  /** Top-k characteristic terms per document by smoothed TF-IDF
    * (`tf · (ln((1+N)/(1+df)) + 1)` — sklearn's smooth_idf formula).
    *
    * Fully distributed: term frequencies and document frequencies are two
    * hash aggregations over the exploded token stream; the corpus size N
    * (1 row) joins back via broadcast. The df join carries no hint: the
    * vocabulary grows with the corpus, so pinning it on every executor is
    * wrong at scale — AQE broadcasts it when it is actually small and
    * falls back to a shuffle join keyed by term otherwise. Top-k is a
    * per-document row_number, rank on the ROUNDED score + term tie-break
    * so results are reproducible across engines. */
  def tfIdfTopK(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      explode(tokens(normalized(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) +
          lit(1.0)), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("tfidf"), col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("tfidf"))
  }

  /** DuckDB twin of [[tfIdfTopK]] over the `documents` table. */
  def tfIdfTopKSql(k: Int): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf,
       |    round(tf * (ln((1 + n_docs) / (1 + df)) + 1), 4) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, rnk, term, tf, tfidf FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term) AS INT) AS rnk
       |  FROM scored)
       |WHERE rnk <= $k""".stripMargin.replace('\n', ' ')
  }

  // --------------------------------------------------------- BM25 retrieval

  /** BM25 scoring of the corpus against a (small, driver-known) bag of
    * query terms — the retrieval primitive behind quality-targeted
    * corpus curation ("find documents about X") and search-style eval
    * set mining. Lucene-shaped formula: `idf = ln(1 + (N − df + 0.5) /
    * (df + 0.5))`, `tfNorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * with k1 = 1.2, b = 0.75.
    *
    * Scale: the token stream filters to the query terms BEFORE the tf
    * aggregate (per-doc state only for matching terms); df and the
    * corpus stats (N, avgdl) are metadata-sized aggregates that join
    * back broadcast; the per-doc length table joins keyed by id with no
    * hint (corpus-proportional — AQE decides); top-k is a
    * TakeOrderedAndProject, never a global sort.
    *
    * Determinism: per-term scores are IEEE-identical in both engines
    * (same literals, same parenthesization, ln bit-stable — the
    * t5/t16 evidence), rounded to 6 dp and summed in DECIMAL so
    * cross-partition addition order cannot perturb the total. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 10): DataFrame = {
    // Single-pass form (r14, guide §2.3/§2.4): doc length and the
    // per-query-term tf are PER-ROW ARRAY MATH over the tokenized
    // text — the corpus token stream is never exploded and never
    // shuffled (the old shape exploded it four times and hash-
    // aggregated it by doc_id twice: at scale that is two shuffles of
    // every token in the corpus to compute a handful of counts). Only
    // matched (doc, term) rows — query terms are few — reach an
    // exchange. Every arithmetic expression (idf, tfNorm, the
    // round/decimal ladder) is unchanged operand-for-operand, so the
    // scores and the oracle hash are identical to the exploded form
    // (the twin SQL still describes the spec shape).
    val perDoc = docs
      .select(col(idCol), tokens(normalized(col(textCol))).as("toks"))
      .select(col(idCol) +: size(col("toks")).cast("long").as("dlen") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t)))
            .cast("long").as(s"_tf$i")
        }: _*)
      // a NULL text tokenizes to NULL: the exploded form dropped such
      // docs (explode of NULL emits no row), so drop them here too
      .filter(col("dlen").isNotNull)
    // corpus stats AND per-term document frequencies in ONE single-row
    // aggregate (df_i = #docs whose tf_i > 0 — the same count the old
    // groupBy(term) produced, as a conditional sum)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      ((sum(col("dlen")).cast("double") / count(lit(1))).as("avgdl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))): _*)
    val tf = perDoc
      .select(col(idCol), col("dlen"),
        explode(array(queryTerms.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("term"), lit(i + 1).as("idx"),
            col(s"_tf$i").as("tf"))
        }: _*)).as("e"))
      .select(col(idCol), col("dlen"), col("e.idx").as("idx"),
        col("e.tf").as("tf"))
      .filter(col("tf") > 0)
    // the matched row picks its term's df out of the broadcast stat row
    val dfOfTerm = element_at(
      array(queryTerms.indices.map(i => col(s"_df$i")): _*), col("idx"))
    val idf = log(lit(1.0) +
      (col("n_docs") - dfOfTerm + lit(0.5)) / (dfOfTerm + lit(0.5)))
    val tfNorm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + (lit(0.75) * col("dlen")) / col("avgdl")))
    tf.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(idf * tfNorm, 6).cast("decimal(14,6)").as("term_score"))
      .groupBy(col(idCol))
      .agg(sum(col("term_score")).cast("double").as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)
  }

  /** DuckDB twin of [[bm25TopK]] over the `documents` table. */
  def bm25TopKSql(queryTerms: Seq[String], k: Int): String = {
    val toks = tokensSql(normalizedSql("text"))
    // SQL-escape: a term containing a quote must not break the twin
    val qList = queryTerms.map(s => s"'${s.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs,
       |  CAST(sum(dlen) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE list_contains($qList, term) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, CAST(round(
       |    ln(CAST('1' AS DOUBLE) +
       |      (n_docs - df + CAST('0.5' AS DOUBLE)) /
       |      (df + CAST('0.5' AS DOUBLE))) *
       |    ((tf * CAST('2.2' AS DOUBLE)) /
       |     (tf + CAST('1.2' AS DOUBLE) *
       |      (CAST('0.25' AS DOUBLE) +
       |       (CAST('0.75' AS DOUBLE) * dlen) / avgdl))), 6)
       |    AS DECIMAL(14,6)) AS term_score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
       |    CROSS JOIN stats)
       |SELECT doc_id, CAST(sum(term_score) AS DOUBLE) AS bm25,
       |  count(*) AS n_terms_hit
       |FROM scored GROUP BY 1
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------- unigram LM quality proxy

  /** Unigram log-probability scoring — the offline stand-in for LM
    * perplexity filtering (CCNet-style): score each document by the
    * mean log-probability of its tokens under the corpus's own unigram
    * distribution. Gibberish / rare-token-stuffed docs score low.
    *
    * Distribution: term frequencies are one hash aggregate over the
    * exploded token stream; the per-term log-prob joins back keyed by
    * term with NO broadcast hint (vocabulary grows with the corpus —
    * AQE broadcasts it only when actually small, the t5 lesson); the
    * corpus size joins as a broadcast 1-row aggregate.
    *
    * Determinism: each token's log-prob is rounded to 6 decimals and
    * summed in DECIMAL — float addition reorders across partitions, so
    * the only IEEE ops are the per-token `ln` (bit-stable across both
    * engines on these inputs — the t5 evidence) and the final
    * sum/count division of identical operands. */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(tokens(normalized(col(textCol)))).as("term"))
    val freq = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("n_corpus"))
    val termLp = freq.crossJoin(broadcast(total))
      .select(col("term"),
        round(log(col("cnt").cast("double") / col("n_corpus")), 6)
          .cast("decimal(12,6)").as("term_lp"))
    toks.join(termLp, "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("term_lp")).as("sum_lp_d"))
      .select(col(idCol), col("n_tokens"),
        col("sum_lp_d").cast("double").as("sum_logprob"),
        (col("sum_lp_d").cast("double") / col("n_tokens"))
          .as("mean_logprob"))
  }

  /** DuckDB twin of [[unigramLogProb]] over `documents`. */
  def unigramLogProbSql(): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents),
       |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
       |total AS (SELECT count(*) AS n_corpus FROM toks),
       |term_lp AS (SELECT term,
       |    CAST(round(ln(CAST(cnt AS DOUBLE) / n_corpus), 6)
       |      AS DECIMAL(12,6)) AS term_lp
       |  FROM freq CROSS JOIN total)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(term_lp) AS DOUBLE) AS sum_logprob,
       |  CAST(sum(term_lp) AS DOUBLE) / count(*) AS mean_logprob
       |FROM toks JOIN term_lp USING (term)
       |GROUP BY 1""".stripMargin.replace('\n', ' ')
  }

  /** Bigram LM log-probability — the next step up from [[unigramLogProb]]
    * in the offline perplexity-filter family: score each document by the
    * mean conditional log-probability `ln(C(w1,w2) / C(w1,·))` of its
    * bigrams under the corpus's own MLE bigram model (every observed
    * bigram has positive probability, so no smoothing term is needed for
    * self-scoring). Word-salad documents score far below fluent ones
    * even when their unigram mix looks normal.
    *
    * Scale shape: bigrams materialize row-locally (one transform over
    * the token array — tokens carry no spaces, so `w1 w2` concatenation
    * is collision-free); bigram and context counts are two hash
    * aggregates over the exploded stream; the per-bigram log-prob joins
    * back keyed by bigram with NO broadcast hint (the bigram vocabulary
    * grows superlinearly with the corpus — AQE decides). Determinism:
    * the t16 pattern — 6 dp rounded log-probs, DECIMAL sums. */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // The token array is materialized behind its own projection BEFORE the
    // bigram lambda: `element_at` over the raw tokens(normalized(...)) tree
    // inside `transform` re-ran the whole tokenizer chain ~2n times per row
    // (O(n²·|text|) per document — 21 s at sf0.1 where the unigram sibling
    // is 0.7 s), the same HOF-inlining trap documented at
    // Similarity.bandedBuckets. Over an attribute each element_at is O(1);
    // CollapseProject keeps the boundary because the non-cheap alias is
    // referenced more than once.
    val withToks = docs.select(col(idCol),
      tokens(normalized(col(textCol))).as("toks"))
    val bigrams = withToks.select(col(idCol),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1)))).as("bigram"))
    val bgCnt = bigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bg"))
      .withColumn("ctx", substring_index(col("bigram"), " ", 1))
    val ctxCnt = bgCnt.groupBy(col("ctx")).agg(sum(col("c_bg")).as("c_ctx"))
    val bgLp = bgCnt.join(ctxCnt, "ctx")
      .select(col("bigram"),
        round(log(col("c_bg").cast("double") / col("c_ctx")), 6)
          .cast("decimal(12,6)").as("bg_lp"))
    bigrams.join(bgLp, "bigram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bg_lp")).as("sum_lp_d"))
      .select(col(idCol), col("n_bigrams"),
        col("sum_lp_d").cast("double").as("sum_logprob"),
        (col("sum_lp_d").cast("double") / col("n_bigrams"))
          .as("mean_logprob"))
  }

  /** DuckDB twin of [[bigramLogProb]] over `documents`. */
  def bigramLogProbSql(): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH tl AS (SELECT doc_id, $toks AS l FROM documents),
       |bigrams AS (SELECT doc_id, unnest(list_transform(
       |    range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bigram
       |  FROM tl),
       |bg AS (SELECT bigram, count(*) AS c_bg,
       |    split_part(bigram, ' ', 1) AS ctx
       |  FROM bigrams GROUP BY 1),
       |ctx AS (SELECT ctx, sum(c_bg) AS c_ctx FROM bg GROUP BY 1),
       |bg_lp AS (SELECT bigram,
       |    CAST(round(ln(CAST(c_bg AS DOUBLE) / c_ctx), 6)
       |      AS DECIMAL(12,6)) AS bg_lp
       |  FROM bg JOIN ctx USING (ctx))
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(bg_lp) AS DOUBLE) AS sum_logprob,
       |  CAST(sum(bg_lp) AS DOUBLE) / count(*) AS mean_logprob
       |FROM bigrams JOIN bg_lp USING (bigram)
       |GROUP BY 1""".stripMargin.replace('\n', ' ')
  }

  /** Top-N bigram collocations by pointwise mutual information —
    * PMI(a,b) = ln(p(ab) / (p(a)·p(b))) = ln(c_ab·Nu² / (Nb·c_a·c_b)) —
    * with a min-count cutoff against singleton noise (the classic
    * collocation-extraction recipe; what phrase-vocabulary builders run
    * before merging multiword tokens).
    *
    * Scale: unigram/bigram counts are the two corpus-sized hash
    * aggregates (map-side partial); everything after runs on the
    * ≥minCount bigram table (vocabulary-sized) with single-row totals
    * broadcast. The final cut is TakeOrderedAndProject on (pmi DESC,
    * bigram) — total order, no global sort. Determinism: the PMI ratio
    * multiplies the same double-cast operands in the same order in both
    * engines, then rounds the ln to 6 dp (the t16/t19 pattern);
    * double-casting BEFORE multiplying keeps c·Nu² out of ANSI bigint
    * overflow at corpus scale. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, topN: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // token array materialized behind a projection (bandedBuckets trap)
    val withToks = docs.select(col(idCol),
      tokens(normalized(col(textCol))).as("toks"))
    val bigrams = withToks.select(
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1)))).as("bigram"))
    val unigrams = withToks.select(explode(col("toks")).as("term"))
    val uCnt = unigrams.groupBy(col("term")).agg(count(lit(1)).as("c_u"))
    val uTot = unigrams.agg(count(lit(1)).as("nu"))
    val bCnt = bigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bg")).filter(col("c_bg") >= minCount)
    val bTot = bigrams.agg(count(lit(1)).as("nb"))
    bCnt
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uCnt.select(col("term").as("w1"), col("c_u").as("c_1")), "w1")
      .join(uCnt.select(col("term").as("w2"), col("c_u").as("c_2")), "w2")
      .crossJoin(broadcast(uTot)).crossJoin(broadcast(bTot))
      .withColumn("pmi", round(log(
        col("c_bg").cast("double") * col("nu").cast("double") *
          col("nu").cast("double") /
          (col("nb").cast("double") * col("c_1").cast("double") *
            col("c_2").cast("double"))), 6))
      .select(col("bigram"), col("c_bg").as("n_pair"),
        col("c_1").as("n_w1"), col("c_2").as("n_w2"), col("pmi"))
      .orderBy(desc("pmi"), col("bigram")).limit(topN)
  }

  /** DuckDB twin of [[pmiCollocations]] over `documents`. */
  def pmiCollocationsSql(minCount: Long = 5, topN: Int = 20): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH tl AS (SELECT doc_id, $toks AS l FROM documents),
       |bigrams AS (SELECT unnest(list_transform(
       |    range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bigram
       |  FROM tl),
       |unigrams AS (SELECT unnest(l) AS term FROM tl),
       |uc AS (SELECT term, count(*) AS c_u FROM unigrams GROUP BY 1),
       |nu AS (SELECT count(*) AS nu FROM unigrams),
       |bc AS (SELECT bigram, count(*) AS c_bg FROM bigrams
       |  GROUP BY 1 HAVING count(*) >= $minCount),
       |nb AS (SELECT count(*) AS nb FROM bigrams)
       |SELECT bigram, CAST(c_bg AS BIGINT) AS n_pair,
       |  CAST(c1.c_u AS BIGINT) AS n_w1, CAST(c2.c_u AS BIGINT) AS n_w2,
       |  round(ln(CAST(c_bg AS DOUBLE) * CAST(nu AS DOUBLE)
       |      * CAST(nu AS DOUBLE)
       |    / (CAST(nb AS DOUBLE) * CAST(c1.c_u AS DOUBLE)
       |      * CAST(c2.c_u AS DOUBLE))), 6) AS pmi
       |FROM bc
       |JOIN uc c1 ON split_part(bigram, ' ', 1) = c1.term
       |JOIN uc c2 ON split_part(bigram, ' ', 2) = c2.term
       |CROSS JOIN nu CROSS JOIN nb
       |ORDER BY pmi DESC, bigram LIMIT $topN"""
      .stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------------------------ PII scrub

  /** PII patterns — the common subset of Java regex (Spark) and RE2
    * (DuckDB): character classes, bounded repetition, no backrefs or
    * lookaround, so both engines match identically. */
  val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val ipRe    = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII detection + redaction (emails, phone numbers, IPv4 addresses):
    * per-match counts and a scrubbed text with each occurrence replaced
    * by a typed placeholder. The standard pre-release gate on training
    * corpora. Pure per-row regex transforms — no shuffle, runs at scan
    * speed; at 100 TB the only cost knob is regex complexity, which is
    * why the patterns avoid backtracking-prone constructs. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // Column-API pattern literals (lit), NOT expr(): embedding the regex
    // in a SQL string would re-interpret its backslashes in the parser
    def nMatches(re: String) =
      size(regexp_extract_all(t, lit(re), lit(0)))
    docs
      .withColumn("n_emails", nMatches(emailRe))
      .withColumn("n_phones", nMatches(phoneRe))
      .withColumn("n_ips", nMatches(ipRe))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(t,
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
  }

  /** DuckDB twin of [[piiScrub]] as a SELECT-list fragment over text
    * expression `t`. DuckDB's regexp_replace is first-match-only by
    * default — the 'g' flag mirrors Spark's replace-all. The regexes
    * embed verbatim: DuckDB single-quoted literals keep backslashes. */
  def piiScrubSql(t: String): String = {
    val (e, p, i) = (emailRe, phoneRe, ipRe)
    s"""CAST(len(regexp_extract_all($t, '$e', 0)) AS INT) AS n_emails,
       |CAST(len(regexp_extract_all($t, '$p', 0)) AS INT) AS n_phones,
       |CAST(len(regexp_extract_all($t, '$i', 0)) AS INT) AS n_ips,
       |regexp_replace(regexp_replace(regexp_replace($t,
       |  '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g'), '$i', '<IP>', 'g')
       |  AS scrubbed,
       |len(regexp_extract_all($t, '$e', 0))
       |  + len(regexp_extract_all($t, '$p', 0))
       |  + len(regexp_extract_all($t, '$i', 0)) > 0 AS has_pii"""
      .stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------------------ sequence packing

  /** Concat-and-chunk sequence packing: lay the corpus out as one token
    * stream per stratum (source/shard) in content-fingerprint order —
    * deterministic, RNG-free, the same order the samplers use — and cut
    * it into fixed `capacity`-token context windows. Each document gets
    * the pack it STARTS in, its token offset inside that pack, and
    * whether it straddles a pack boundary (the fraction of straddlers is
    * the packing-efficiency metric pretraining pipelines watch).
    *
    * The running position is [[graft.etl.Ids.keyedCumsum]] — two-phase
    * offsets, so low-cardinality strata never funnel through one task:
    * this must scale with corpus size, not stratum count. */
  def packSequences(docs: DataFrame, strataCol: String, capacity: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withTok = docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
    packSequencesPre(withTok, strataCol, capacity, idCol).drop("__fp")
  }

  /** [[packSequences]] over PRECOMPUTED (`fpCol`, `nTokensCol`) — the
    * t39 composition path: the packing shuffle (keyedCumsum's range
    * repartition) then moves only metadata-width rows, never text. */
  def packSequencesPre(docs: DataFrame, strataCol: String,
      capacity: Int, idCol: String = "doc_id", fpCol: String = "__fp",
      nTokensCol: String = "n_tokens"): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val cum = graft.etl.Ids.keyedCumsum(docs, strataCol,
      Seq(fpCol, idCol), nTokensCol, "cum_tokens")
    val start = col("cum_tokens") - col(nTokensCol)
    cum
      .withColumn("pack_id",
        expr(s"(cum_tokens - $nTokensCol) div $capacity"))
      .withColumn("offset_in_pack", start % capacity)
      .withColumn("crosses_boundary",
        start % capacity + col(nTokensCol) > capacity)
      .drop("cum_tokens")
  }

  // -------------------------------------------------- chunking w/ overlap

  /** Sliding-window chunking: cut each document into `window`-token
    * chunks every `stride` tokens (overlap = window − stride), the RAG /
    * long-context preprocessing step. Chunk starts are 0, stride,
    * 2·stride, …; a document shorter than one window yields exactly one
    * chunk; the final chunk may be short (never empty).
    *
    * Purely row-local: materialize the token array once (interpreted
    * higher-order functions re-evaluate child expressions per element —
    * the d7 lesson), explode the per-doc chunk index range, slice. No
    * shuffle; output size scales with corpus tokens / stride, each
    * input row fanning out independently — embarrassingly parallel at
    * any corpus size. */
  def chunkOverlap(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window: window=$window stride=$stride")
    val n = col("n_tokens")
    val nChunks = when(n <= window, lit(1L))
      // exact integer ceil((n-window)/stride) + 1 — Column./ is double
      // division in Spark, so the ceil goes through SQL `div`
      .otherwise(
        expr(s"(n_tokens - $window + $stride - 1) div $stride + 1"))
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_len",
        least(lit(window), n - col("chunk_start")))
      .withColumn("chunk_text", array_join(
        slice(col("__toks"), (col("chunk_start") + 1).cast("int"),
          lit(window)),
        " "))
      .drop("__toks")
  }

  /** DuckDB twin of [[chunkOverlap]] over `documents`. */
  def chunkOverlapSql(window: Int, stride: Int): String = {
    val toks = tokensSql("text")
    s"""SELECT doc_id, lang, source, n_tokens, chunk_id,
       |  chunk_id * $stride AS chunk_start,
       |  least($window, n_tokens - chunk_id * $stride) AS chunk_len,
       |  array_to_string(list_slice(toks,
       |    chunk_id * $stride + 1, chunk_id * $stride + $window), ' ')
       |    AS chunk_text
       |FROM (
       |  SELECT doc_id, lang, source, toks,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    unnest(range(0, CASE WHEN len(toks) <= $window THEN 1
       |      ELSE (len(toks) - $window + $stride - 1) // $stride + 1
       |      END)) AS chunk_id
       |  FROM (SELECT doc_id, lang, source, $toks AS toks
       |        FROM documents))""".stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------------------- TextRank

  /** TextRank corpus keywords (Mihalcea & Tarau 2004, keyword mode):
    * PageRank over the word co-occurrence graph — nodes are
    * normalized tokens, an undirected edge links each ADJACENT token
    * pair (window 2, unweighted, deduped), rank = 5 damped
    * iterations, output = the top-N terms. The graph-centrality
    * alternative to frequency-based keyword lists (x3) and tf-idf
    * (t5): a term ranks high when it co-occurs with other
    * high-ranking terms, not merely when it is common.
    *
    * Composition, not re-implementation: the edge list feeds
    * [[graft.graph.PageRank]] unchanged, inheriting its exact
    * integer fixed-point determinism (the oracle unrolls the same
    * iterations via PageRank.sql over the same SQL-rendered edges).
    * Scale: the pair explode is row-local off the materialized token
    * array (HOF rule); the graph is VOCABULARY-bounded — distinct
    * token pairs, not corpus positions — so the rank frame broadcasts
    * and the cached edge table never re-shuffles across iterations.
    * Ties in the top-N cut break by term, exactly as in the twin. */
  def textRankKeywords(docs: DataFrame, topN: Int = 20,
      iters: Int = 5, textCol: String = "text"): DataFrame = {
    val withToks = docs.select(
      tokens(normalized(col(textCol))).as("toks"))
    val pairs = withToks.select(
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .unionAll(pairs.select(col("w2").as("src"), col("w1").as("dst")))
    graft.graph.PageRank.run(edges, iters = iters,
      broadcastRanks = true, symmetric = true)
      .orderBy(desc("rank_units"), col("node"))
      .limit(topN)
  }

  /** DuckDB twin of [[textRankKeywords]] over `documents`. */
  def textRankKeywordsSql(topN: Int = 20, iters: Int = 5): String = {
    val toks = tokensSql(normalizedSql("text"))
    val edgesRel =
      s"""(WITH bg AS (SELECT l[i] AS w1, l[i + 1] AS w2
         |    FROM (SELECT $toks AS l FROM documents) tl,
         |      unnest(range(1, len(l))) AS u(i)
         |    WHERE l[i] <> l[i + 1])
         |  SELECT w1 AS src, w2 AS dst FROM bg
         |  UNION ALL SELECT w2, w1 FROM bg)"""
        .stripMargin.replace('\n', ' ')
    graft.graph.PageRank.sql(edgesRel, iters = iters) +
      s" ORDER BY rank_units DESC, node LIMIT $topN"
  }

  /** DuckDB twin of [[packSequences]] over `documents` (single-task
    * window oracle-side — test scale only). */
  def packSequencesSql(strataCol: String, capacity: Int): String = {
    val toks = tokensSql("text")
    s"""SELECT doc_id, lang, source, n_tokens,
       |  CAST((cum_tokens - n_tokens) // $capacity AS BIGINT) AS pack_id,
       |  CAST((cum_tokens - n_tokens) % $capacity AS BIGINT)
       |    AS offset_in_pack,
       |  (cum_tokens - n_tokens) % $capacity + n_tokens > $capacity
       |    AS crosses_boundary
       |FROM (
       |  SELECT doc_id, lang, source,
       |    CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(len($toks) AS BIGINT)) OVER (
       |      PARTITION BY $strataCol
       |      ORDER BY ${fingerprintSql("text")}, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_tokens
       |  FROM documents)""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------- Zipf fit

  /** Zipf rank-frequency fit (t33): OLS slope of ln(freq) on ln(rank)
    * over the top-`topK` tokens — the corpus-shape diagnostic paired
    * with g19's degree-tail Hill exponent: natural language sits near
    * slope −1; templated/generated text flattens, boilerplate steepens.
    *
    * Scale: one scan to the vocabulary grain, a top-K cut as
    * `orderBy(...).limit(topK)` — TakeOrderedAndProject, per-partition
    * heaps + a driver merge of K rows, never a global rank window over
    * the vocabulary — then the rank window runs over the K retained
    * rows only (metadata-sized). Determinism: ln terms are 6dp-rounded doubles
    * (the g19 ln discipline), products widen through DECIMAL(28,12)
    * before the order-free decimal sums; slope/intercept are fixed
    * double trees over the exact sums, rounded once. */
  def zipfFit(docs: DataFrame, topK: Int = 100,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(explode(tokens(normalized(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val ranked = freq
      .orderBy(desc("cnt"), col("term")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("cnt"), col("term"))))
    val xy = ranked.select(
      round(log(col("rnk").cast("double")), 6)
        .cast("decimal(12,6)").as("x"),
      round(log(col("cnt").cast("double")), 6)
        .cast("decimal(12,6)").as("y"))
    val ag = xy.agg(count(lit(1)).as("n_terms"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(28,12)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).as("sxx"))
    val n = col("n_terms").cast("double")
    val slope = (n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    ag.select(col("n_terms"),
      round(slope, 6).as("slope"),
      round((col("sy").cast("double") - slope *
        col("sx").cast("double")) / n, 6).as("intercept"))
  }

  /** DuckDB twin of [[zipfFit]] over `documents`. */
  def zipfFitSql(topK: Int = 100): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH freq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($toks) AS term FROM documents)
       |  GROUP BY 1),
       |ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term)
       |    AS rnk FROM freq QUALIFY rnk <= $topK),
       |xy AS (SELECT
       |    CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
       |    CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
       |  FROM ranked),
       |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(sum(x) AS DECIMAL(20,6)) AS sx,
       |    CAST(sum(y) AS DECIMAL(20,6)) AS sy,
       |    CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DECIMAL(38,12))
       |      AS sxy,
       |    CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DECIMAL(38,12))
       |      AS sxx
       |  FROM xy)
       |SELECT n_terms,
       |  round((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) -
       |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) -
       |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       |  round((CAST(sy AS DOUBLE) -
       |    (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) -
       |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |      (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) -
       |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |      CAST(sx AS DOUBLE)) / CAST(n_terms AS DOUBLE), 6)
       |    AS intercept
       |FROM ag""".stripMargin.replace('\n', ' ')
  }

  // --------------------------------------------------------- Heaps fit

  /** Heaps'-law vocabulary-growth fit (t34): V(N) ≈ K·N^β measured on
    * nested content-hash corpus cuts (⅛, ¼, ½, 1) — the how-fast-does-
    * vocabulary-grow readout that sizes tokenizer vocabularies and
    * predicts OOV rates at 100× the corpus, pairing with [[zipfFit]]
    * (Zipf slope ↔ Heaps β are two views of the same law).
    *
    * Scale: ONE corpus scan to the (level, term) grain (≤ 4×vocab
    * rows); token totals and first-appearance levels both derive from
    * that bounded frame — the nested cuts cost no extra passes (the
    * ml14 nested-cut trick, per-term min level instead of per-cut
    * distinct counts). Determinism: the ml14 md5-prefix hash picks the
    * cuts; ln points round once at 6 dp; the 4-point OLS runs on
    * decimal sums with fixed final trees (the zipfFit discipline). */
  def heapsFit(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4),
      16, 10).cast("long")
    val lvl = when(h < 8192L, 1).when(h < 16384L, 2)
      .when(h < 32768L, 3).otherwise(4)
    val cnts = docs
      .select(lvl.as("lvl"),
        explode(tokens(normalized(col(textCol)))).as("term"))
      .groupBy(col("lvl"), col("term"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocab-bounded; feeds both reductions
    val nt = cnts.groupBy(col("lvl")).agg(sum(col("c")).as("nt"))
    val nv = cnts.groupBy(col("term")).agg(min(col("lvl")).as("ml"))
      .groupBy(col("ml").as("lvl")).agg(count(lit(1)).as("nv"))
    val cum = Window.orderBy(col("lvl"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val pts = Seq((1, 125), (2, 250), (3, 500), (4, 1000))
      .toDF("lvl", "cut_permille")
      .join(nt, Seq("lvl"), "left").join(nv, Seq("lvl"), "left")
      .na.fill(0L, Seq("nt", "nv"))
      .withColumn("n_tokens", sum(col("nt")).over(cum))
      .withColumn("n_distinct", sum(col("nv")).over(cum))
      .withColumn("x", when(col("n_tokens") > 0,
        round(log(col("n_tokens").cast("double")), 6))
        .cast("decimal(12,6)"))
      .withColumn("y", when(col("n_distinct") > 0,
        round(log(col("n_distinct").cast("double")), 6))
        .cast("decimal(12,6)"))
    val fit = pts
      .withColumn("np", count(col("x")).over(whole))
      .withColumn("sx", sum(col("x")).over(whole))
      .withColumn("sy", sum(col("y")).over(whole))
      .withColumn("sxy", sum((col("x") * col("y"))
        .cast("decimal(28,12)")).over(whole))
      .withColumn("sxx", sum((col("x") * col("x"))
        .cast("decimal(28,12)")).over(whole))
    val n = col("np").cast("double")
    val beta = (n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    fit.select(col("cut_permille"), col("n_tokens"), col("n_distinct"),
      round(beta, 6).as("beta"),
      round((col("sy").cast("double") - beta *
        col("sx").cast("double")) / n, 6).as("ln_k"))
      .orderBy("cut_permille")
  }

  /** DuckDB twin of [[heapsFit]] over `documents`. */
  def heapsFitSql(): String = {
    val toks = tokensSql(normalizedSql("text"))
    s"""WITH lv AS (SELECT CASE
       |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
       |      AS BIGINT) < 8192 THEN 1
       |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
       |      AS BIGINT) < 16384 THEN 2
       |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
       |      AS BIGINT) < 32768 THEN 3
       |    ELSE 4 END AS lvl, unnest($toks) AS term FROM documents),
       |cnts AS (SELECT lvl, term, CAST(count(*) AS BIGINT) AS c
       |  FROM lv GROUP BY 1, 2),
       |nt AS (SELECT lvl, CAST(sum(c) AS BIGINT) AS nt
       |  FROM cnts GROUP BY 1),
       |nv AS (SELECT ml AS lvl, CAST(count(*) AS BIGINT) AS nv FROM
       |  (SELECT term, min(lvl) AS ml FROM cnts GROUP BY 1) GROUP BY 1),
       |sp AS (SELECT * FROM (VALUES (1, 125), (2, 250), (3, 500),
       |  (4, 1000)) AS v(lvl, cut_permille)),
       |cm AS (SELECT cut_permille,
       |    CAST(sum(coalesce(nt.nt, 0)) OVER w AS BIGINT) AS n_tokens,
       |    CAST(sum(coalesce(nv.nv, 0)) OVER w AS BIGINT) AS n_distinct
       |  FROM sp LEFT JOIN nt ON sp.lvl = nt.lvl
       |  LEFT JOIN nv ON sp.lvl = nv.lvl
       |  WINDOW w AS (ORDER BY sp.lvl
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |xy AS (SELECT cut_permille, n_tokens, n_distinct,
       |    CAST(CASE WHEN n_tokens > 0
       |      THEN round(ln(CAST(n_tokens AS DOUBLE)), 6) END
       |      AS DECIMAL(12,6)) AS x,
       |    CAST(CASE WHEN n_distinct > 0
       |      THEN round(ln(CAST(n_distinct AS DOUBLE)), 6) END
       |      AS DECIMAL(12,6)) AS y
       |  FROM cm),
       |ag AS (SELECT CAST(count(x) AS BIGINT) AS np,
       |    CAST(sum(x) AS DECIMAL(20,6)) AS sx,
       |    CAST(sum(y) AS DECIMAL(20,6)) AS sy,
       |    CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DECIMAL(38,12))
       |      AS sxy,
       |    CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DECIMAL(38,12))
       |      AS sxx
       |  FROM xy)
       |SELECT cut_permille, n_tokens, n_distinct,
       |  round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
       |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
       |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
       |  round((CAST(sy AS DOUBLE) -
       |    (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
       |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |      (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
       |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |      CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE), 6) AS ln_k
       |FROM xy CROSS JOIN ag ORDER BY cut_permille"""
      .stripMargin.replace('\n', ' ')
  }
}
