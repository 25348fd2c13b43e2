package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-bounded distributed algorithm:
  *
  *  - exact: fingerprint → groupBy — one shuffle on the 128-bit hash; at
  *    100 TB the shuffle carries (hash, id), never the text;
  *  - MinHash+LSH: shingle → K minhashes → B bands → bucket-join — the
  *    classic near-dup pipeline (Broder '97; used by every large LM corpus
  *    cleanup). Candidate pairs are generated per-bucket (self-join within
  *    band buckets, never a global cross join) and verified with exact
  *    Jaccard;
  *  - SimHash: 64-bit signature per doc; Hamming-≤k pairs found by pigeonhole
  *    blocking on signature chunks (k+1 chunks → any pair within distance k
  *    shares ≥1 exact chunk) — again bucket-join, no cross join;
  *  - n-gram Jaccard: exact sparse similarity join via token posting lists
  *    (explode → join on token → count shared / union);
  *  - embedding cosine: see [[graft.sim.Similarity]].
  *
  * All hashing uses xxhash64 (engine-native, codegen'd). Oracle note: only
  * the hash-free operators (exact-dup groups via md5, n-gram Jaccard) have
  * DuckDB twins; LSH/SimHash outputs are checked rows-only + by ScalaTest
  * with planted near-duplicates.
  */
object Dedup {

  /** Exact dedup groups: one row per duplicated normalized text, with the
    * canonical (min) id, the duplicate count, and all member ids. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("canonical_id"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .filter(col("n_copies") > 1)

  /** Exact dedup: keep one row per distinct normalized text (the min-id
    * member). Equivalent to ROW_NUMBER-over-fingerprint = 1 but cheaper:
    * a single partial/final min aggregation + semi join. */
  def dropExactDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keep = docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Cross-batch incremental dedup — the continuous-ingestion operator
    * the within-corpus family (d1–d9) lacks: an INCOMING batch dedups
    * against the ALREADY-INGESTED corpus without ever re-reading corpus
    * text. The corpus side reduces to its distinct fingerprint set at
    * scan speed (16 bytes per distinct text — the dedup INDEX a lake
    * persists between ingest runs; at 100 TB that index is ~10⁻⁴ of the
    * corpus and the only corpus-derived thing that moves). The incoming
    * batch fingerprints once, anti-joins the index (batch-sized probe),
    * then keeps the min-id member per surviving fingerprint — the
    * within-batch dedup rides the same aggregate. Returns (id,
    * fingerprint) of the accepted rows: exactly what a writer appends
    * to the corpus AND merges back into the index. */
  def incrementalDedup(corpus: DataFrame, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val index = corpus
      .select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .distinct()
    incoming
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .join(index, Seq("fingerprint"), "left_anti")
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fingerprint"))
  }

  /** Signature-only variant of [[incrementalNearDedup]] (d13): verify
    * candidates by ESTIMATED Jaccard — the fraction of agreeing minhash
    * components — instead of exact shingle overlap, so corpus TEXT is
    * never touched after index build. The persisted index grows from
    * B band rows to B + K longs per doc (still ~10⁻³ of corpus bytes);
    * in exchange the verify leg is a pure signature join bounded by
    * candidates, with no corpus re-read at all — the trade a lake makes
    * when the corpus is cold storage. Estimator contract: E[agree/K] =
    * true Jaccard, σ = √(J(1−J)/K) ≈ 0.12 at K=16 — a SCREENING
    * verifier (pair quality), not an exact one, which is why the
    * harness entry is rows-only (like d2/d4) with recall pinned in
    * DedupSpec rather than a DuckDB twin. */
  def incrementalNearDedupBySignature(corpus: DataFrame,
      incoming: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, numHashes: Int = 16,
      bands: Int = 4, minAgree: Double = 0.7): DataFrame = {
    // Both signature frames feed two consumers each (banding + the
    // verify join); materialize them once — K longs per doc, and the
    // corpus side IS the "persisted index" this operator models.
    val cs = minhashSignatures(corpus, idCol, textCol, k, numHashes)
      .localCheckpoint()
    val is = minhashSignatures(incoming, idCol, textCol, k, numHashes)
      .localCheckpoint()
    val index = bandBuckets(cs, idCol, numHashes, bands)
      .withColumnRenamed(idCol, "__corpus_id")
    val probes = bandBuckets(is, idCol, numHashes, bands)
    val cands = probes.join(index, Seq("band", "bucket"))
      .select(col(idCol), col("__corpus_id")).distinct()
    val csr = cs.select(col(idCol).as("__corpus_id") +:
      (0 until numHashes).map(i => col(s"mh_$i").as(s"c_mh_$i")): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"mh_$i") === col(s"c_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    val rejected = cands
      .join(is, Seq(idCol))
      .join(csr, Seq("__corpus_id"))
      .filter(agree.cast("double") >= lit(minAgree * numHashes))
      .select(col(idCol)).distinct()
    incoming
      .join(rejected, Seq(idCol), "left_anti")
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fingerprint"))
  }

  // ------------------------------------------------------------ MinHash LSH

  /** Distinct character shingles (k-grams) from an already-materialized
    * normalized-text COLUMN (see [[ngramsFromTokens]] for why the input
    * must be a bound column, not the normalization expression: the
    * interpreted lambda would re-normalize the text per position). */
  def shinglesFromNorm(norm: Column, k: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))

  /** Distinct character shingles (k-grams) of the normalized text.
    * Convenience form for one-off expressions; pipelines should
    * materialize the normalized column once. */
  def shingles(text: Column, k: Int = 5): Column =
    shinglesFromNorm(TextAnalysis.normalized(text), k)

  /** MinHash signature: for seed s, min over shingles of xxhash64(shingle, s).
    * Computed via explode + groupBy-min: one shuffle keyed by doc id; the
    * K mins aggregate map-side, so shuffle volume is K longs per doc. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, numHashes: Int = 16): DataFrame = {
    val exploded = docs
      .select(col(idCol),
        TextAnalysis.normalized(col(textCol)).as("__norm"))
      .select(col(idCol),
        explode(shinglesFromNorm(col("__norm"), k)).as("shingle"))
    val minExprs = (0 until numHashes).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"mh_$s"))
    exploded.groupBy(col(idCol)).agg(minExprs.head, minExprs.tail: _*)
  }

  /** MinHash signatures from an ALREADY-MATERIALIZED shingle column —
    * the reuse form of [[minhashSignatures]] for pipelines that consume
    * the shingle arrays more than once (the NearDupIndexStore ingest
    * shingled its batch three times before this existed: probe leg,
    * verify leg, survivor index append — guide §1.2 "don't compute
    * things you throw away"). Identical hash family and aggregation ⇒
    * byte-identical signatures and band rows. */
  def minhashFromShingles(docs: DataFrame, idCol: String,
      shCol: String, numHashes: Int = 16): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(col(shCol)).as("shingle"))
    val minExprs = (0 until numHashes).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"mh_$s"))
    exploded.groupBy(col(idCol)).agg(minExprs.head, minExprs.tail: _*)
  }

  /** ENGINE-PORTABLE MinHash-LSH (d17): the d2 algorithm with the
    * md5-prefix hash family `h_s(x) = int(md5("s:" || x)[0:12])`
    * instead of seeded xxhash64, so the DuckDB oracle replays the
    * SIGNATURES — and therefore the banding and every candidate pair —
    * exactly. d2 (xxhash64) remains the 100 TB path (md5 is ~10×
    * slower per shingle); this row exists so the LSH *algorithm* —
    * min-wise signatures, band split, bucket agreement — carries
    * oracle evidence instead of only spec fixtures.
    *
    * @return (id_a, id_b, n_bands, sig_agree): pairs sharing ≥ 1 full
    *         band (id_a < id_b), how many of the B bands agree, and
    *         how many of the K minhashes agree (K·J estimate of
    *         Jaccard). One shuffle keyed by doc for the signatures,
    *         band-bucket self-joins for the pairs — never all-pairs. */
  def portableMinhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val exploded = docs
      .select(col(idCol),
        TextAnalysis.normalized(col(textCol)).as("__norm"))
      .select(col(idCol),
        explode(shinglesFromNorm(col("__norm"), k)).as("shingle"))
    val minExprs = (0 until numHashes).map(s =>
      min(expr("CAST(conv(substring(md5(concat('" + s +
        ":', shingle)), 1, 12), 16, 10) AS BIGINT)")).as(s"mh_$s"))
    val sigs = exploded.groupBy(col(idCol))
      .agg(minExprs.head, minExprs.tail: _*)
      .localCheckpoint() // referenced per band + for the agree join
    val bandKeys = (0 until bands).map { b =>
      sigs.select(col(idCol), lit(b).as("band"),
        concat_ws(",", (0 until rows).map(r =>
          col(s"mh_${b * rows + r}").cast("string")): _*).as("bkey"))
    }.reduce(_.unionAll(_))
    val pairs = bandKeys.alias("x")
      .join(bandKeys.alias("y"),
        col("x.band") === col("y.band") &&
          col("x.bkey") === col("y.bkey") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
    val agree = (0 until numHashes)
      .map(s => when(col(s"a.mh_$s") === col(s"b.mh_$s"), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    pairs
      .join(sigs.alias("a"), col("id_a") === col(s"a.$idCol"))
      .join(sigs.alias("b"), col("id_b") === col(s"b.$idCol"))
      .select(col("id_a"), col("id_b"), col("n_bands"),
        agree.as("sig_agree"))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB twin of [[portableMinhashPairs]]; `corpusRel` yields
    * (doc_id, text). */
  def portableMinhashPairsSql(corpusRel: String, k: Int = 5,
      numHashes: Int = 16, bands: Int = 4): String = {
    val rows = numHashes / bands
    val norm = TextAnalysis.normalizedSql("text")
    val sh = s"list_distinct([substr(n, i, $k) " +
      s"for i in range(1, greatest(len(n) - ${k - 1}, 1) + 1)])"
    val mins = (0 until numHashes).map(s =>
      s"min(CAST(('0x' || substr(md5('$s:' || shingle), 1, 12)) " +
        s"AS BIGINT)) AS mh_$s").mkString(", ")
    val bandSel = (0 until bands).map { b =>
      val key = (0 until rows)
        .map(r => s"CAST(mh_${b * rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until numHashes)
      .map(s => s"CASE WHEN a.mh_$s = b.mh_$s THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |shl AS (SELECT doc_id, unnest($sh) AS shingle
       |  FROM (SELECT doc_id, $norm AS n FROM corpus)),
       |sigs AS (SELECT doc_id, $mins FROM shl GROUP BY 1),
       |bk AS ($bandSel),
       |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |    count(*) AS n_bands
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.id_a, p.id_b, p.n_bands,
       |  CAST($agree AS BIGINT) AS sig_agree
       |FROM pairs p
       |JOIN sigs a ON a.doc_id = p.id_a
       |JOIN sigs b ON b.doc_id = p.id_b
       |ORDER BY p.id_a, p.id_b""".stripMargin.replace('\n', ' ')
  }

  /** (band, bucket, id) rows from minhash signatures — the banded LSH
    * bucketing shared by the within-corpus pair generator
    * ([[lshCandidatePairs]]) and the persistable cross-batch index
    * ([[lshBandIndex]]). K minhashes split into B bands of R rows
    * (K = B·R); the bucket key is the engine hash of the band's rows. */
  def bandBuckets(signatures: DataFrame, idCol: String = "doc_id",
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*)
          .as("bucket"))
    }
    signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** LSH candidate pairs: docs sharing any full band land in a bucket;
    * pairs are generated within buckets only. */
  def lshCandidatePairs(signatures: DataFrame, idCol: String = "doc_id",
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val bucketed = bandBuckets(signatures, idCol, numHashes, bands)
    val left = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("id_a"))
    val right = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("id_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** The corpus's persistable MinHash-LSH BAND INDEX — the near-dup
    * analog of [[incrementalDedup]]'s exact-fingerprint index: one
    * (band, bucket, id) row per document per band, B·(4+8+8) bytes per
    * doc no matter how long its text. This is what a lake keeps between
    * ingest runs: new batches probe it without re-shingling a byte of
    * corpus text, and accepted rows' bucket rows merge back in. */
  def lshBandIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, numHashes: Int = 16,
      bands: Int = 4): DataFrame =
    bandBuckets(minhashSignatures(docs, idCol, textCol, k, numHashes),
      idCol, numHashes, bands)

  /** Cross-batch incremental NEAR-dup dedup — [[incrementalDedup]]'s
    * fuzzy sibling (d11): an incoming batch dedups against the
    * already-ingested corpus catching MUTATED re-deliveries (boilerplate
    * edits, appended footers) that slip past the exact fingerprint
    * index. Semantics: an incoming doc is rejected iff some corpus doc's
    * exact shingle-Jaccard with it reaches `threshold`; survivors then
    * collapse within-batch to the min-id member per exact fingerprint
    * (the d10 aggregate). Returns the accepted (id, fingerprint) rows.
    *
    * Distributed shape, stage by stage (the 100 TB story):
    *  1. the corpus side is its [[lshBandIndex]] — persisted between
    *     runs in production, ~10⁻³ of corpus bytes; corpus TEXT is never
    *     re-shingled for the probe;
    *  2. the batch's band rows join the index on (band, bucket) —
    *     batch-sized probe, same shape as d10's anti join;
    *  3. candidate pairs are verified with EXACT shingle Jaccard; only
    *     candidates' corpus partners are re-read (semi join on id), so
    *     the verify leg is bounded by the candidate count, not the
    *     corpus. (A lake that cannot afford the text re-read persists
    *     the K-minhash signatures alongside the index and verifies by
    *     estimated Jaccard instead — same plan shape, no text join.)
    *  4. exact re-deliveries are subsumed free: identical text ⇒
    *     identical signature ⇒ all bands collide ⇒ candidate with
    *     Jaccard 1.
    *
    * Oracle note: unlike d2/d4 (rows-only), the d11 harness entry IS
    * DuckDB-checked — the oracle computes ground-truth all-pairs
    * Jaccard over the (sliced) batch×corpus, so a green row ALSO
    * certifies the band probe's recall was total on this corpus at
    * these parameters (deterministic hashing, fixed data; the planted
    * and natural near-dups all sit at Jaccard ≥ 0.93, where a 16-hash/
    * 4-band miss has probability < 0.4% per pair and zero observed). */
  def incrementalNearDedup(corpus: DataFrame, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 5,
      numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val index = lshBandIndex(corpus, idCol, textCol, k, numHashes, bands)
      .withColumnRenamed(idCol, "__corpus_id")
    val probes = lshBandIndex(incoming, idCol, textCol, k, numHashes,
      bands)
    // The candidate list is a deliberate STAGE BOUNDARY: it feeds both
    // the pair-verify join and the corpus-side semi join below, and
    // without materialization each consumer re-executes the whole
    // index+probe subtree, re-shingling BOTH texts — measured 2× the
    // operator's cost at sf0.1. It is metadata-sized (two ids per band
    // collision, ~10⁻³ of corpus bytes) — exactly the frame a
    // production ingest persists between candidate-gen and verify.
    val cands = probes.join(index, Seq("band", "bucket"))
      .select(col(idCol), col("__corpus_id")).distinct()
      .localCheckpoint()
    def sh(df: DataFrame, out: String) = df
      .select(col(idCol), TextAnalysis.normalized(col(textCol))
        .as("__norm"))
      .select(col(idCol), shinglesFromNorm(col("__norm"), k).as(out))
    val corpusSh = sh(corpus.join(
        cands.select(col("__corpus_id").as(idCol)).distinct(),
        Seq(idCol), "left_semi"), "__sh_c")
      .withColumnRenamed(idCol, "__corpus_id")
    val rejected = cands
      .join(sh(incoming, "__sh_i"), Seq(idCol))
      .join(corpusSh, Seq("__corpus_id"))
      .filter(
        size(array_intersect(col("__sh_i"), col("__sh_c")))
          .cast("double") /
          size(array_union(col("__sh_i"), col("__sh_c")))
            .cast("double") >= threshold)
      .select(col(idCol)).distinct()
    incoming
      .join(rejected, Seq(idCol), "left_anti")
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fingerprint"))
  }

  /** Jaccard over stop-token-pruned word 1-gram sets via posting-list
    * join — the verification stage after LSH, and a standalone operator.
    * shared(a,b) / (|a| + |b| − shared) over the pruned sets. No cross
    * join: only token-sharing pairs materialize.
    *
    * Skew control: the self-join generates df² candidate rows per token,
    * so a single stop-word-grade token (df in the millions) is quadratic
    * death regardless of corpus fraction — the bound must be ABSOLUTE.
    * Tokens with df > `maxDf` are pruned from the posting lists first —
    * the standard stop-word cutoff every production similarity join
    * applies (such tokens carry no discriminative signal anyway). Both
    * sides of the Jaccard (shared counts AND set sizes) use the pruned
    * sets, and the DuckDB twin mirrors the cutoff, so results stay
    * engine-exact; at test scale (df ≪ 10k) nothing is pruned and the
    * output equals the unpruned Jaccard.
    *
    * Scale shape: df table is vocabulary-sized and the hot-token set tiny
    * (AQE broadcasts it on its own — no manual hint); the sizes join is a
    * plain shuffle join keyed by id, never a corpus-cardinality
    * broadcast. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.8,
      maxDf: Long = 10000L): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol))))).as("tok"))
    // array_distinct upstream ⇒ count(*) per token IS document frequency
    val hot = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("tok"))
    val kept = toks.join(hot, Seq("tok"), "left_anti")
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val shared = kept.select(col("id").as("id_a"), col("tok"))
      .join(kept.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      // EXACT half-away 4-dp quantized ratio in pure integers
      // (round-8 q-discipline): (2*shared*1e4 + uni) div (2*uni) =
      // round-half-up(shared/uni * 1e4); non-negative operands, so
      // truncating and flooring integral division agree cross-engine
      .withColumn("jaccard_e4", expr(
        "(2 * shared * 10000 + (sz_a + sz_b - shared)) div " +
          "(2 * (sz_a + sz_b - shared))"))
      .filter(col("jaccard_e4") >= math.round(threshold * 10000))
      .select(col("id_a"), col("id_b"), col("jaccard_e4"))
  }

  /** DuckDB twin of [[ngramJaccardPairs]] (including the df cutoff).
    * `docsRel` is any relation expression with columns (id, text), e.g.
    * `(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200)`. */
  def ngramJaccardSql(docsRel: String, threshold: Double,
      maxDf: Long = 10000L): String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    s"""WITH docs AS (SELECT * FROM $docsRel),
       |toks AS (
       |  SELECT id, unnest(list_distinct(regexp_split_to_array($norm, '\\s+')))
       |    AS tok FROM docs),
       |hot AS (SELECT tok FROM (SELECT tok, count(*) AS df FROM toks
       |  GROUP BY tok) WHERE df > $maxDf),
       |kept AS (SELECT * FROM toks
       |  WHERE tok NOT IN (SELECT tok FROM hot)),
       |sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY id),
       |shared AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
       |  FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST((2 * shared * 10000 + (sa.sz + sb.sz - shared)) //
       |    (2 * (sa.sz + sb.sz - shared)) AS BIGINT) AS jaccard_e4
       |FROM shared
       |JOIN sizes sa ON sa.id = id_a
       |JOIN sizes sb ON sb.id = id_b
       |WHERE (2 * shared * 10000 + (sa.sz + sb.sz - shared)) //
       |  (2 * (sa.sz + sb.sz - shared)) >= ${math.round(threshold * 10000)}"""
      .stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash from word tokens: per bit, sum ±1 weighted by token
    * hash bit; sign → bit. Computed via explode + bitwise aggregation. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol))))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"bit_$b")
    }
    val summed = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), sig.as("simhash"))
  }

  /** ENGINE-PORTABLE SimHash (d4p): the d4 algorithm under the
    * md5-prefix hash family — 48-bit signatures (12 hex chars of md5
    * give exactly 48 hash bits, so every signature bit comes from the
    * same portable hash both engines compute), so the DuckDB oracle
    * replays bit sums → signatures → pigeonhole buckets → every
    * near-pair exactly. d4 (xxhash64, 64-bit) remains the production
    * path; this row gives the SimHash algorithm itself hash-matching
    * oracle evidence (the d17 pattern). Pair with
    * [[simhashNearPairs]](sigBits = 48). */
  def portableSimhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", bits: Int = 48): DataFrame = {
    require(bits >= 1 && bits <= 48, s"md5 prefix carries 48 bits; got $bits")
    val toks = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol))))).as("tok"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT)"))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"bit_$b")
    }
    val summed = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map { b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), sig.as("simhash"))
  }

  /** DuckDB twin of [[portableSimhash]] + [[simhashNearPairs]]:
    * identical bit sums, signature packing, pigeonhole chunks, and
    * exact popcount filter. `docsRel` yields (doc_id, text). */
  def portableSimhashPairsSql(docsRel: String, maxDist: Int = 3,
      bits: Int = 48): String = {
    val chunks = maxDist + 1
    val width = bits / chunks
    val norm = TextAnalysis.normalizedSql("text")
    val bitSums = (0 until bits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b_$b")
      .mkString(", ")
    // disjoint bit positions ⇒ + is exactly bitwise OR (and sidesteps
    // cross-engine | precedence differences)
    val sig = (0 until bits).map(b =>
      s"(CASE WHEN b_$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (SELECT * FROM $docsRel),
       |toks AS (SELECT doc_id,
       |    unnest(list_distinct(regexp_split_to_array($norm, '\\s+')))
       |      AS tok
       |  FROM docs),
       |h AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h
       |  FROM toks),
       |sums AS (SELECT doc_id, $bitSums FROM h GROUP BY 1),
       |sig AS (SELECT doc_id, $sig AS simhash FROM sums),
       |ch AS (SELECT doc_id, simhash, cs.ci,
       |    (simhash >> (cs.ci * $width)) & ${(1L << width) - 1} AS cv
       |  FROM sig, (SELECT CAST(x AS INT) AS ci
       |    FROM generate_series(0, ${chunks - 1}) t(x)) cs),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.cv = b.cv
       |    AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sa, sb)) <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin.replace('\n', ' ')
  }

  /** Hamming-distance-≤ maxDist pairs via pigeonhole blocking: split the
    * `sigBits`-bit signature into (maxDist+1) chunks; any qualifying pair
    * must share at least one exact chunk → bucket-join on (chunkIdx,
    * chunkVal), then exact popcount filter. */
  def simhashNearPairs(sigs: DataFrame, idCol: String = "doc_id",
      maxDist: Int = 3, sigBits: Int = 64): DataFrame = {
    val chunks = maxDist + 1
    // width 0 would give every chunk an all-zero mask — one global
    // bucket, i.e. a silent quadratic self-join instead of blocking
    require(sigBits / chunks >= 1,
      s"sigBits=$sigBits cannot split into maxDist+1=$chunks chunks " +
        "of >= 1 bit; lower maxDist or widen the signature")
    val width = sigBits / chunks
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("cv"))
    }
    val blocked = sigs
      .select(col(idCol), col("simhash"),
        explode(array(chunkCols: _*)).as("ch"))
      .select(col(idCol), col("simhash"), col("ch.ci"), col("ch.cv"))
    val left = blocked.select(col("ci"), col("cv"), col(idCol).as("id_a"),
      col("simhash").as("sig_a"))
    val right = blocked.select(col("ci"), col("cv"), col(idCol).as("id_b"),
      col("simhash").as("sig_b"))
    left.join(right, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // -------------------------------------------- benchmark decontamination

  /** Distinct word n-grams from an already-materialized token-array
    * COLUMN. The distinction matters for performance: higher-order
    * functions evaluate interpreted, re-computing their child expression
    * per element — if `toks` were the split-regex expression itself, the
    * text would be re-tokenized at every gram position (O(len²) regex
    * work per doc; measured 3× the whole query's runtime). A bound
    * column reference is free to re-evaluate. */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-grams of the normalized text (as joined strings).
    * Convenience form for one-off expressions; pipelines should
    * materialize the token column once and use [[ngramsFromTokens]]. */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsFromTokens(
      TextAnalysis.tokens(TextAnalysis.normalized(text)), n)

  /** (id, gram) posting rows via a materialized token projection. */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(
        TextAnalysis.normalized(col(textCol))).as("toks"))
      .select(col(idCol),
        explode(ngramsFromTokens(col("toks"), n)).as("gram"))

  /** N-gram CONTAINMENT pairs (d14) — the ASYMMETRIC near-dup measure
    * Jaccard structurally misses: containment(A→B) = |A∩B| / |A| over
    * word-n-gram sets flags "A is (mostly) inside B" even when B is
    * 100× longer — quote/excerpt duplication, boilerplate inclusion,
    * the doc-embeds-doc case (Broder's original resemblance/
    * containment pair). Directed by construction: (a contained-in b)
    * and (b contained-in a) are different facts and both emit when
    * true.
    *
    * Same scale shape as [[ngramJaccardPairs]]: posting-list join with
    * the absolute-df stop-gram cutoff bounding per-gram fan-out; the
    * denominator join ships only the probe side's gram-set sizes. */
  def ngramContainmentPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, threshold: Double = 0.9,
      maxDf: Long = 10000L): DataFrame = {
    val g = gramRows(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), col("gram"))
    val hot = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("gram"))
    val kept = g.join(hot, Seq("gram"), "left_anti")
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    kept.select(col("id").as("id_a"), col("gram"))
      .join(kept.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      // exact half-away 4-dp integer quantization (round-8 discipline)
      .withColumn("containment_e4", expr(
        "(2 * shared * 10000 + sz_a) div (2 * sz_a)"))
      .filter(col("containment_e4") >= math.round(threshold * 10000))
      .select(col("id_a"), col("id_b"), col("containment_e4"))
  }

  /** DuckDB twin of [[ngramContainmentPairs]]; `docsRel` yields
    * (id, text). */
  def ngramContainmentSql(docsRel: String, n: Int = 3,
      threshold: Double = 0.9, maxDf: Long = 10000L): String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val toks = s"regexp_split_to_array($norm, '\\s+')"
    val grams = s"[array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len(toks)-$n+2)]"
    s"""WITH g AS (
       |  SELECT id, unnest(list_distinct($grams)) AS gram
       |  FROM (SELECT id, $toks AS toks FROM $docsRel)
       |  WHERE len(toks) >= $n),
       |hot AS (SELECT gram FROM (SELECT gram, count(*) AS df FROM g
       |  GROUP BY gram) WHERE df > $maxDf),
       |kept AS (SELECT * FROM g
       |  WHERE gram NOT IN (SELECT gram FROM hot)),
       |sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY id),
       |shared AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
       |  FROM kept a JOIN kept b ON a.gram = b.gram AND a.id <> b.id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST((2 * shared * 10000 + sa.sz) // (2 * sa.sz) AS BIGINT)
       |    AS containment_e4
       |FROM shared JOIN sizes sa ON sa.id = id_a
       |WHERE (2 * shared * 10000 + sa.sz) // (2 * sa.sz)
       |  >= ${math.round(threshold * 10000)}""".stripMargin.replace('\n', ' ')
  }

  /** Per-document n-gram novelty (t37) — the memorization/diversity
    * metric curation pipelines rank by: what fraction of a document's
    * distinct word n-grams appear in NO other document (corpus df = 1)?
    * Low novelty = boilerplate/template mass the near-dup family may
    * still miss (shared fragments below any pairwise threshold); high
    * novelty = unique long-tail content worth upweighting. The
    * complement of d8's duplicate-span view: d8 finds the shared
    * spans, this scores every document by how little of it is shared.
    *
    * Scale shape: one token pass to DISTINCT (id, gram) postings, one
    * gram-grain df aggregate (partial-agg friendly — df caps at
    * |docs|), one postings⋈df join back, one id-grain aggregate. No
    * pairs anywhere — novelty replaces the quadratic pair question
    * with a linear df question, which is why it runs where all-pairs
    * cannot. Pure integer outputs: novelty_e6 is one truncating
    * division of non-negative counts. Docs with < n tokens have no
    * grams and are excluded (no 0/0 convention). */
  def ngramNovelty(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val g = gramRows(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), col("gram"))
    val df = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    g.join(df, Seq("gram"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id"), col("n_grams"), col("n_novel"),
        expr("(n_novel * 1000000) div n_grams").as("novelty_e6"))
      .orderBy("id")
  }

  /** DuckDB twin of [[ngramNovelty]]; `docsRel` yields (id, text). */
  def ngramNoveltySql(docsRel: String, n: Int = 3): String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val toks = s"regexp_split_to_array($norm, '\\s+')"
    val grams = s"[array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len(toks)-$n+2)]"
    s"""WITH g AS (
       |  SELECT id, unnest(list_distinct($grams)) AS gram
       |  FROM (SELECT id, $toks AS toks FROM $docsRel)
       |  WHERE len(toks) >= $n),
       |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
       |SELECT id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel,
       |  CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000) //
       |    count(*) AS BIGINT) AS novelty_e6
       |FROM g JOIN df USING (gram)
       |GROUP BY id ORDER BY id""".stripMargin.replace('\n', ' ')
  }

  /** Cross-source n-gram overlap matrix (t38) — the data-MIXING
    * diagnostic: which corpus sources duplicate each other's content,
    * and by how much? A mixing recipe that weights two 90%-overlapping
    * crawls as independent sources double-counts their mass; this
    * reports every source pair's shared distinct-gram count and the
    * containment-style overlap ratio shared/min(|A|,|B|). t37 scores
    * documents, this scores the SOURCE digraph — the view a curation
    * run reads before setting t36's mixture weights.
    *
    * Scale shape: one token pass to DISTINCT (source, gram) postings
    * (grain: grams × sources, not docs), then a gram-keyed self-join
    * whose per-gram fan-out is capped by |sources|² — a metadata-sized
    * dimension, never corpus-sized — and a pair-grain aggregate. The
    * full matrix (zeros included) comes from the |sources|²-row size
    * cross join, so absent overlap is reported, not silently missing.
    * Integer e6 ratio by truncating division. */
  def sourceOverlap(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val g = gramRows(docs, groupCol, textCol, n)
      .select(col(groupCol).as("src"), col("gram")).distinct()
    val sz = g.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    val shared = g.select(col("src").as("src_a"), col("gram"))
      .join(g.select(col("src").as("src_b"), col("gram")), Seq("gram"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    sz.select(col("src").as("src_a"), col("sz").as("sz_a"))
      .join(sz.select(col("src").as("src_b"), col("sz").as("sz_b")),
        col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .withColumn("shared", coalesce(col("shared"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        col("shared"),
        expr("(shared * 1000000) div least(sz_a, sz_b)")
          .as("overlap_e6"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB twin of [[sourceOverlap]]; `docsRel` yields (src, text). */
  def sourceOverlapSql(docsRel: String, n: Int = 3): String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val toks = s"regexp_split_to_array($norm, '\\s+')"
    val grams = s"[array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len(toks)-$n+2)]"
    s"""WITH g AS (
       |  SELECT DISTINCT src, unnest(list_distinct($grams)) AS gram
       |  FROM (SELECT src, $toks AS toks FROM $docsRel)
       |  WHERE len(toks) >= $n),
       |sz AS (SELECT src, count(*) AS sz FROM g GROUP BY src),
       |sh AS (SELECT a.src AS src_a, b.src AS src_b,
       |    count(*) AS shared
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
       |  GROUP BY 1, 2)
       |SELECT sa.src AS src_a, sb.src AS src_b,
       |  sa.sz AS sz_a, sb.sz AS sz_b,
       |  CAST(coalesce(shared, 0) AS BIGINT) AS shared,
       |  CAST((coalesce(shared, 0) * 1000000) // least(sa.sz, sb.sz)
       |    AS BIGINT) AS overlap_e6
       |FROM sz sa JOIN sz sb ON sa.src < sb.src
       |LEFT JOIN sh ON sh.src_a = sa.src AND sh.src_b = sb.src
       |ORDER BY src_a, src_b""".stripMargin.replace('\n', ' ')
  }

  /** Benchmark decontamination: drop every corpus document sharing at
    * least one word n-gram with the benchmark (eval-set) documents — the
    * standard guard against test-set leakage into training corpora
    * (GPT-3 appendix C / PaLM-style n-gram overlap).
    *
    * Shape: both sides explode to DISTINCT (gram, id) posting rows; the
    * contaminated-id set is a semi join keyed by gram, then the corpus
    * anti-joins the (tiny) contaminated-id list — which AQE broadcasts.
    * The corpus text itself never shuffles, and the benchmark side is
    * eval-set-sized (thousands of docs), so its gram set stays small. At
    * 100 TB the gram strings would be xxhash64'd to 8-byte keys before
    * the join; kept as strings here so DuckDB can mirror the join
    * exactly. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5): DataFrame = {
    val benchGrams = gramRows(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    val contaminated = gramRows(corpus, idCol, textCol, n)
      .join(benchGrams, Seq("gram"), "left_semi")
      .select(col(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** DuckDB twin of [[decontaminate]]: `corpusRel`/`benchRel` are relation
    * expressions with (doc_id, text) among their columns; emits the kept
    * corpus doc_ids (SELECT * of corpusRel minus contaminated). */
  def decontaminateSql(corpusRel: String, benchRel: String,
      n: Int = 5): String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    val toks = s"regexp_split_to_array($norm, '\\s+')"
    val grams = s"[array_to_string(toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len(toks)-$n+2)]"
    s"""WITH cg AS (
       |  SELECT doc_id, unnest(list_distinct($grams)) AS gram
       |  FROM (SELECT doc_id, $toks AS toks FROM $corpusRel)
       |  WHERE len(toks) >= $n),
       |bg AS (
       |  SELECT DISTINCT unnest(list_distinct($grams)) AS gram
       |  FROM (SELECT $toks AS toks FROM $benchRel)
       |  WHERE len(toks) >= $n),
       |bad AS (SELECT DISTINCT doc_id FROM cg
       |  WHERE gram IN (SELECT gram FROM bg))
       |SELECT * FROM $corpusRel
       |WHERE doc_id NOT IN (SELECT doc_id FROM bad)"""
      .stripMargin.replace('\n', ' ')
  }

  /** End-to-end near-duplicate removal: given a candidate near-dup PAIR
    * list from any of the pair generators (MinHash-LSH, SimHash, n-gram
    * Jaccard, embedding cosine), cluster pairs transitively (connected
    * components) and drop every clustered document except its canonical
    * (min-id) member. Unpaired documents pass through untouched.
    *
    * Scale: the non-canonical id list is |clustered docs| rows of a single
    * long — tiny relative to the corpus (near-dup rates are single-digit
    * percents in practice), so the anti join broadcasts under AQE; the
    * corpus itself never shuffles. */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val clusters = graft.graph.ConnectedComponents.run(
      pairs.select(col("id_a"), col("id_b")))
    val losers = clusters.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------- span-level dedup

  /** Span-level duplicate-substring detection — the token-shingle form of
    * exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): a k-token window occurring more than
    * once ANYWHERE in the corpus (another doc or the same doc) marks its
    * k tokens as duplicated; overlapping marks merge into maximal spans.
    * Per surviving doc: span count, duplicated-token count, duplicated
    * fraction — the quantity curation pipelines threshold on before
    * dropping or trimming documents.
    *
    * Distributed shape (the 100 TB story):
    *  1. token arrays are materialized ONCE per doc behind a projection
    *     boundary (the HOF-inlining trap documented at
    *     [[graft.sim.Similarity]] bandedBuckets);
    *  2. each occurrence ships as (md5(shingle), id, pos) — 16-byte key,
    *     the text itself never shuffles;
    *  3. duplicated keys come from one count aggregate (partial maps
    *     collapse singletons before the exchange) + a semi join back;
    *  4. span merging is gaps-and-islands over a per-document window —
    *     bounded by document length, independent of corpus size.
    */
  def duplicateSpans(docs: DataFrame, k: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol),
        TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
          .as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") >= k)
    // one row per shingle occurrence: (id, n_tokens, 1-based pos, hash)
    val sh = toks
      .select(col(idCol), col("n_tokens"),
        posexplode(transform(
          sequence(lit(1), col("n_tokens").cast("int") - (k - 1)),
          i => md5(concat_ws(" ", slice(col("toks"), i, lit(k)))
            .cast("binary")))))
      .select(col(idCol), col("n_tokens"), (col("pos") + 1).as("pos"),
        col("col").as("h"))
    // duplicated-key filter as ONE window count over h instead of a
    // count aggregate + semi-join back (guide §2.4): the old shape
    // re-computed the tokenize+shingle explode for the join's probe
    // side and shuffled the occurrence rows by h TWICE (partial-agg
    // pass + semi-join pass); the window shuffles them once and keeps
    // exactly the same occurrence set (cnt > 1 ⟺ h appears twice+).
    val byKey = Window.partitionBy(col("h"))
    val occ = sh
      .withColumn("cnt", count(lit(1)).over(byKey))
      .filter(col("cnt") > 1)
      .drop("cnt")
    // gaps-and-islands: an occurrence starts a new span iff it leaves at
    // least one uncovered token after the running max end of everything
    // before it (touching intervals merge into one maximal span)
    val before = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    occ
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(before))
      .withColumn("st",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("island", sum(col("st")).over(upToHere))
      .groupBy(col(idCol), col("n_tokens"), col("island"))
      .agg(min(col("pos")).as("s"), max(col("pos") + (k - 1)).as("e"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      .withColumn("dup_fraction",
        col("dup_tokens").cast("double") / col("n_tokens"))
  }

  /** Exact-substring EXCISION — the transform half of Lee et al. 2022's
    * ExactSubstr dedup that [[duplicateSpans]] only measures: every
    * duplicated k-token window is CUT from the corpus except its one
    * canonical occurrence (min (doc_id, pos) corpus-wide), overlapping
    * removable windows merging into maximal spans first. Boilerplate
    * mass shrinks in place; documents survive with their unique content
    * (an empty string marks a fully-duplicated doc — the caller's
    * drop-or-keep call). The canonical copy keeps spans readable where
    * pair/doc-level dedup would have to drop whole documents.
    *
    * Like the paper's suffix-array spans, an occurrence overlapping a
    * canonical window in the same doc can still trim part of it —
    * "keep one copy" is per-WINDOW, and maximal-span merging is
    * deliberately greedy.
    *
    * Distributed shape on top of [[duplicateSpans]]'s (16-byte keys
    * shuffle, text stays put): the canonical pick is a `min(struct)`
    * inside the same count aggregate; spans fold to ONE doc-grain array
    * row per affected doc, join back on id, and the cut itself is
    * row-local HOF arithmetic (filter positions against the span
    * array) — the corpus text never rides a shuffle and there is no
    * token-grain join.
    *
    * @return (doc_id, n_tokens, n_removed, clean_text) for EVERY doc */
  def exciseDuplicateSpans(docs: DataFrame, k: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toksAll = docs
      .select(col(idCol),
        TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
          .as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val sh = toksAll
      .filter(col("n_tokens") >= k)
      .select(col(idCol), col("n_tokens"),
        posexplode(transform(
          sequence(lit(1), col("n_tokens").cast("int") - (k - 1)),
          i => md5(concat_ws(" ", slice(col("toks"), i, lit(k)))
            .cast("binary")))))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("h"))
    // duplicated windows + their canonical occurrence in one aggregate
    val dup = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col(idCol), col("pos"))).as("canon"))
      .filter(col("cnt") > 1)
      .select(col("h"), col("canon"))
    val removable = sh.join(dup, Seq("h"))
      .filter(!(col(idCol) === col("canon")(idCol) &&
        col("pos") === col("canon")("pos")))
      .select(col(idCol), col("pos"))
    // gaps-and-islands (the duplicateSpans merge) over removable only
    val before = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = removable
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(before))
      .withColumn("st",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("island", sum(col("st")).over(upToHere))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), max(col("pos") + (k - 1)).as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    // row-local cut: keep positions no removable span covers. `kept`
    // is bound behind its own projection (referenced twice below —
    // size + join — and re-inlining the HOF chain per reference is the
    // bandedBuckets trap)
    toksAll.join(spans, Seq(idCol), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("toks")).otherwise(
          transform(
            filter(sequence(lit(1), col("n_tokens").cast("int")),
              i => !exists(col("spans"),
                sp => i >= sp.getField("s") && i <= sp.getField("e"))),
            i => element_at(col("toks"), i))))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** DuckDB twin of [[exciseDuplicateSpans]]; `corpusRel` must yield
    * (doc_id, text). The oracle cuts by a token-grain NOT EXISTS
    * instead of the engine's row-local HOF — same kept set. */
  def exciseDuplicateSpansSql(corpusRel: String, k: Int = 8): String = {
    val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
    val km1 = k - 1
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |ta AS (SELECT doc_id, $toks AS toks,
       |    CAST(len($toks) AS BIGINT) AS n_tokens FROM corpus),
       |sh AS (SELECT doc_id,
       |    unnest(generate_series(1, CAST(n_tokens AS INT) - $km1))
       |      AS pos,
       |    unnest(list_transform(
       |      generate_series(1, CAST(n_tokens AS INT) - $km1),
       |      i -> md5(array_to_string(list_slice(toks, i, i + $km1),
       |        ' ')))) AS h
       |  FROM ta WHERE n_tokens >= $k),
       |ranked AS (SELECT doc_id, pos, h,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
       |      AS rn,
       |    count(*) OVER (PARTITION BY h) AS cnt
       |  FROM sh),
       |removable AS (SELECT doc_id, pos FROM ranked
       |  WHERE cnt > 1 AND rn > 1),
       |isl AS (SELECT doc_id, pos,
       |    max(pos + $km1) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_end
       |  FROM removable),
       |gid AS (SELECT doc_id, pos,
       |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM isl),
       |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos + $km1) AS e
       |  FROM gid GROUP BY 1, 2),
       |tok AS (SELECT doc_id, n_tokens,
       |    unnest(generate_series(1, CAST(n_tokens AS INT))) AS pos,
       |    unnest(toks) AS tok
       |  FROM ta),
       |keep AS (SELECT t.doc_id, t.n_tokens, t.pos, t.tok FROM tok t
       |  WHERE NOT EXISTS (SELECT 1 FROM sp
       |    WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)),
       |agg AS (SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |  FROM keep GROUP BY 1)
       |SELECT ta.doc_id, ta.n_tokens,
       |  ta.n_tokens - COALESCE(a.n_kept, 0) AS n_removed,
       |  COALESCE(a.clean_text, '') AS clean_text
       |FROM ta LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
  }
}
