package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ENGINE-PORTABLE similarity variants (sim2p / sim4p / sim7p): the
  * sim2 / sim4 / sim7 algorithms re-run under exact integer arithmetic
  * and the md5-prefix hash family, so a DuckDB oracle replays
  * signatures → buckets → candidates → ranks EXACTLY — the d17
  * MinHash pattern applied to the vector family. The xxhash64/double
  * production paths in [[Similarity]] remain the 100 TB path (xxhash64
  * is ~10× cheaper than md5 and float dot products codegen tighter);
  * these rows exist so the hyperplane-LSH and IVF algorithms
  * THEMSELVES carry hash-matching oracle evidence instead of only
  * spec fixtures and measured-recall reports.
  *
  * Portability disciplines (settled law in this repo — see SCALE.md
  * §oracle-parity):
  *  - vectors quantize ONCE: q = floor(x·1000) over the float→double
  *    cast. Both engines widen float→double exactly and multiply in
  *    IEEE doubles, so the pre-floor value is bit-identical; floor is
  *    exact. Everything downstream is integer.
  *  - hyperplane weights w(pos, plane) =
  *    md5int48("pos:plane") % 2001 − 1000 ∈ [−1000, 1000] — the
  *    engine-portable pseudo-random family (Spark
  *    `conv(substring(md5(..),1,12),16,10)`; DuckDB
  *    `('0x' || substr(md5(..),1,12))::BIGINT`).
  *  - cosine NEVER materializes as a float: every comparison is the
  *    exact rational cross-multiplication
  *    sign(d) · (d²·S div (‖a‖²·‖b‖²)) in Spark DECIMAL(38,0) /
  *    DuckDB HUGEINT. f(c) = sign(c)·c² is strictly monotone in
  *    cosine, so ranking by the quantized integer (ties broken by id)
  *    gives both engines the same total order. Negation happens AFTER
  *    the division of non-negative magnitudes, where Spark's
  *    truncating `div` and DuckDB's flooring `//` agree.
  *
  * Magnitude budget at testdata scale (dim 64, |x| ≤ ~0.6 ⇒ |q| ≤
  * ~600, ≤ 2000 vectors): |dot| ≤ 64·600² ≈ 2.3e7 ⇒ dot²·1e8 ≈ 5e22;
  * trained-IVF centroid sums |s| ≤ 2000·600 = 1.2e6 ⇒ d ≤ 4.6e10 ⇒
  * d²·1e12 ≈ 2.2e33 — all inside DECIMAL(38,0) and HUGEINT. At real
  * scale the q-grid and scale factors shrink to budget (the plans are
  * unchanged); the PRODUCTION paths don't pay any of this.
  */
object PortableSim {

  /** Integer-quantized vector rows (id, pos, q), q = floor(x·1000). */
  def quantRows(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("id"), col("pos"),
        expr("CAST(floor(x * 1000D) AS BIGINT)").as("q"))

  /** Portable hyperplane weight table (pos, plane, w) — dims×planes
    * rows, metadata-sized, broadcast wherever it joins. Derived from
    * the quant rows' distinct positions so no dimension constant is
    * collected driver-side. */
  private def planeWeights(q: DataFrame, planes: Int): DataFrame = {
    val spark = q.sparkSession
    q.select(col("pos")).distinct()
      .crossJoin(broadcast(
        spark.range(planes).select(col("id").cast("int").as("plane"))))
      .withColumn("w", expr(
        "CAST(conv(substring(md5(concat(CAST(pos AS STRING), ':', " +
          "CAST(plane AS STRING))), 1, 12), 16, 10) AS BIGINT) " +
          "% 2001 - 1000"))
  }

  /** Per-(id, band) signature words over `bands`×`bandBits` portable
    * hyperplanes: bit j of band b = [projection on plane b·bandBits+j
    * ≥ 0]. One broadcast join + two partial-aggregating shuffles
    * (id×planes, then id×bands) — the corpus vector itself never
    * re-shuffles. */
  private def signatureWords(q: DataFrame, bands: Int,
      bandBits: Int): DataFrame = {
    val w = planeWeights(q, bands * bandBits)
    q.join(broadcast(w), Seq("pos"))
      .groupBy(col("id"), col("plane"))
      .agg(sum(col("q") * col("w")).as("p"))
      .groupBy(col("id"),
        expr(s"CAST(plane div $bandBits AS INT)").as("band"))
      .agg(sum(expr(
        s"CASE WHEN p >= 0 THEN shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(plane % $bandBits AS INT)) ELSE CAST(0 AS BIGINT) " +
          "END")).as("bkey"))
  }

  /** Exact integer pair statistics (dot, na2, nb2) for candidate
    * (id_a, id_b) pairs — per-pair O(dims) posting rows, candidates
    * only (never all-pairs). */
  private def pairSums(cand: DataFrame, q: DataFrame): DataFrame =
    cand.select(col("id_a"), col("id_b"))
      .join(q.select(col("id").as("id_a"), col("pos"),
        col("q").as("qa")), Seq("id_a"))
      .join(q.select(col("id").as("id_b"), col("pos"),
        col("q").as("qb")), Seq("id_b", "pos"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("qa") * col("qb")).as("dot"),
        sum(col("qa") * col("qa")).as("na2"),
        sum(col("qb") * col("qb")).as("nb2"))

  /** sign(dot)·(dot²·1e8 div (na2·nb2)) as a Spark SQL expression —
    * the integer rank score. Strictly monotone in cosine up to the
    * 1e-8 quantization; both engines negate AFTER the non-negative
    * division so truncate-vs-floor semantics never diverge. */
  private val scoreE8 =
    "CASE WHEN dot >= 0 THEN (CAST(dot AS DECIMAL(38,0)) * dot * " +
      "100000000) div (CAST(na2 AS DECIMAL(38,0)) * nb2) ELSE " +
      "-((CAST(dot AS DECIMAL(38,0)) * dot * 100000000) div " +
      "(CAST(na2 AS DECIMAL(38,0)) * nb2)) END"

  // ------------------------------------------------------- sim4p: LSH

  /** PORTABLE banded hyperplane-LSH near-dup pairs (sim4p): banded
    * sign-signature buckets → candidate self-join → exact integer
    * cosine² threshold verify. Same plan shape as
    * [[Similarity.cosineLshNearDupPairs]] (scalar-only band rows, one
    * self-join per band bucket, vectors consulted once for the
    * verify); thresholding is cosine ≥ t expressed exactly as
    * dot > 0 ∧ dot²·1e4 ≥ t²e4·na2·nb2.
    *
    * @param t2e4 t²·1e4 as an exact integer (e.g. t = 0.4 → 1600).
    * @return (id_a, id_b, n_bands, cos2_e8) — agreeing band count and
    *         the quantized cosine², both exact integers. */
  def portableLshPairs(corpus: DataFrame, t2e4: Long = 1600,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 4, bandBits: Int = 8): DataFrame = {
    val q = quantRows(corpus, idCol, vecCol).localCheckpoint()
    val bk = signatureWords(q, bands, bandBits)
    // candidate generation stays scalar: (band, bkey, id) self-join,
    // metadata-sized result, referenced twice (verify + final join)
    val cand = bk.select(col("band"), col("bkey"), col("id").as("id_a"))
      .join(bk.select(col("band"), col("bkey"), col("id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .localCheckpoint()
    pairSums(cand, q)
      .filter(col("dot") > 0 && expr(
        s"CAST(dot AS DECIMAL(38,0)) * dot * 10000 >= " +
          s"CAST($t2e4 AS DECIMAL(38,0)) * na2 * nb2"))
      .join(cand, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("n_bands"),
        expr("CAST((CAST(dot AS DECIMAL(38,0)) * dot * 100000000) " +
          "div (CAST(na2 AS DECIMAL(38,0)) * nb2) AS BIGINT)")
          .as("cos2_e8"))
  }

  /** DuckDB twin of [[portableLshPairs]]; `corpusRel` yields
    * (vec_id, embedding). */
  def portableLshPairsSql(corpusRel: String, t2e4: Long = 1600,
      bands: Int = 4, bandBits: Int = 8): String = {
    val bits = bands * bandBits
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |q AS (SELECT vec_id AS id, CAST(u.i - 1 AS INT) AS pos,
       |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) *
       |      CAST('1000' AS DOUBLE)) AS BIGINT) AS q
       |  FROM corpus,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |w AS (SELECT dp.pos, pl.plane,
       |    CAST(('0x' || substr(md5(CAST(dp.pos AS VARCHAR) || ':' ||
       |      CAST(pl.plane AS VARCHAR)), 1, 12)) AS BIGINT)
       |      % 2001 - 1000 AS w
       |  FROM (SELECT DISTINCT pos FROM q) dp,
       |    (SELECT CAST(x AS INT) AS plane
       |     FROM generate_series(0, ${bits - 1}) t(x)) pl),
       |p AS (SELECT q.id, w.plane, sum(q.q * w.w) AS p
       |  FROM q JOIN w USING (pos) GROUP BY 1, 2),
       |b AS (SELECT id, CAST(plane // $bandBits AS INT) AS band,
       |    sum(CASE WHEN p >= 0
       |      THEN (CAST(1 AS BIGINT) << (plane % $bandBits))
       |      ELSE 0 END) AS bkey
       |  FROM p GROUP BY 1, 2),
       |cand AS (SELECT x.id AS id_a, y.id AS id_b, count(*) AS n_bands
       |  FROM b x JOIN b y ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.id < y.id
       |  GROUP BY 1, 2),
       |s AS (SELECT c.id_a, c.id_b, sum(qa.q * qb.q) AS dot,
       |    sum(qa.q * qa.q) AS na2, sum(qb.q * qb.q) AS nb2
       |  FROM cand c
       |  JOIN q qa ON qa.id = c.id_a
       |  JOIN q qb ON qb.id = c.id_b AND qb.pos = qa.pos
       |  GROUP BY 1, 2)
       |SELECT s.id_a, s.id_b, c.n_bands,
       |  CAST(CAST(s.dot AS HUGEINT) * s.dot * 100000000 //
       |    (CAST(s.na2 AS HUGEINT) * s.nb2) AS BIGINT) AS cos2_e8
       |FROM s JOIN cand c ON c.id_a = s.id_a AND c.id_b = s.id_b
       |WHERE s.dot > 0 AND CAST(s.dot AS HUGEINT) * s.dot * 10000 >=
       |  $t2e4 * CAST(s.na2 AS HUGEINT) * s.nb2
       |ORDER BY s.id_a, s.id_b""".stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------------------- sim2p: IVF

  /** Shared tail of both portable IVF variants: exact-integer scoring
    * of (query_id, corpus_id) candidates and per-query top-k by
    * (score_e8 desc, corpus_id). Zero-norm vectors are excluded on
    * both engines (cosine rank is undefined for them). */
  private def rankCandidates(cand: DataFrame, qAll: DataFrame,
      k: Int): DataFrame = {
    val sums = pairSums(
      cand.select(col("query_id").as("id_a"),
        col("corpus_id").as("id_b")), qAll)
    val wnd = Window.partitionBy(col("query_id"))
      .orderBy(desc("score_e8"), col("corpus_id"))
    sums
      .filter(col("na2") > 0 && col("nb2") > 0)
      .select(col("id_a").as("query_id"), col("id_b").as("corpus_id"),
        expr(scoreE8).as("score_e8"))
      .withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("score_e8"))
  }

  /** PORTABLE hyperplane-IVF top-k (sim2p): the [[Similarity.ivfTopK]]
    * algorithm — sign-bucket coarse quantizer, Hamming-flip
    * multi-probe, in-bucket exact scoring — under the portable hash
    * family and integer rank scores, so bucket assignment, probe
    * order, AND final ranks replay exactly in DuckDB.
    *
    * @return (query_id, rank, corpus_id, score_e8). */
  def portableIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 4, probes: Int = 3): DataFrame = {
    require(probes >= 1 && probes <= bits + 1,
      s"probes must be in [1, bits+1]; got $probes for $bits bits")
    val qc = quantRows(corpus, idCol, vecCol).localCheckpoint()
    val qq = quantRows(queries, idCol, vecCol)
    def buckets(q: DataFrame): DataFrame =
      signatureWords(q, bands = 1, bandBits = bits)
        .select(col("id"), col("bkey").as("bucket"))
    val cb = buckets(qc)
    val probed = buckets(qq).select(col("id").as("query_id"),
      explode(array((0 until probes).map {
        case 0 => col("bucket")
        case i => col("bucket").bitwiseXOR(lit(1L << (i - 1)))
      }: _*)).as("bucket"))
    val cand = cb.select(col("bucket"), col("id").as("corpus_id"))
      .join(broadcast(probed), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"))
    rankCandidates(cand, qc, k)
  }

  /** DuckDB twin of [[portableIvfTopK]]. `queryPred` filters `id`
    * (queries must be a subset of the corpus rows, as in the sim2
    * registration). */
  def portableIvfTopKSql(corpusRel: String, queryPred: String,
      k: Int = 5, bits: Int = 4, probes: Int = 3): String = {
    val flips = (0 until probes).map {
      case 0 => "SELECT id AS query_id, bucket FROM qb"
      case i => s"SELECT id AS query_id, xor(bucket, ${1L << (i - 1)}) " +
        "AS bucket FROM qb"
    }.mkString(" UNION ALL ")
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |q AS (SELECT vec_id AS id, CAST(u.i - 1 AS INT) AS pos,
       |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) *
       |      CAST('1000' AS DOUBLE)) AS BIGINT) AS q
       |  FROM corpus,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |w AS (SELECT dp.pos, pl.plane,
       |    CAST(('0x' || substr(md5(CAST(dp.pos AS VARCHAR) || ':' ||
       |      CAST(pl.plane AS VARCHAR)), 1, 12)) AS BIGINT)
       |      % 2001 - 1000 AS w
       |  FROM (SELECT DISTINCT pos FROM q) dp,
       |    (SELECT CAST(x AS INT) AS plane
       |     FROM generate_series(0, ${bits - 1}) t(x)) pl),
       |p AS (SELECT q.id, w.plane, sum(q.q * w.w) AS p
       |  FROM q JOIN w USING (pos) GROUP BY 1, 2),
       |bkt AS (SELECT id, sum(CASE WHEN p >= 0
       |      THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS bucket
       |  FROM p GROUP BY 1),
       |qb AS (SELECT * FROM bkt WHERE $queryPred),
       |pr AS ($flips),
       |cand AS (SELECT pr.query_id, cb.id AS corpus_id
       |  FROM bkt cb JOIN pr ON cb.bucket = pr.bucket
       |  WHERE cb.id <> pr.query_id),
       |s AS (SELECT c.query_id, c.corpus_id, sum(qa.q * qb2.q) AS dot,
       |    sum(qa.q * qa.q) AS na2, sum(qb2.q * qb2.q) AS nb2
       |  FROM cand c
       |  JOIN q qa ON qa.id = c.query_id
       |  JOIN q qb2 ON qb2.id = c.corpus_id AND qb2.pos = qa.pos
       |  GROUP BY 1, 2),
       |scored AS (SELECT query_id, corpus_id,
       |    CASE WHEN dot >= 0
       |      THEN CAST(CAST(dot AS HUGEINT) * dot * 100000000 //
       |        (CAST(na2 AS HUGEINT) * nb2) AS BIGINT)
       |      ELSE -CAST(CAST(dot AS HUGEINT) * dot * 100000000 //
       |        (CAST(na2 AS HUGEINT) * nb2) AS BIGINT)
       |      END AS score_e8
       |  FROM s WHERE na2 > 0 AND nb2 > 0)
       |SELECT query_id, rank, corpus_id, score_e8 FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_e8 DESC, corpus_id) AS INT) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin.replace('\n', ' ')
  }

  // ----------------------------------------- sim7p: trained IVF (Lloyd)

  /** sign(d)·(d²·1e6 div s2) — the integer ASSIGNMENT score against a
    * centroid represented by its member-SUM vector (cosine is
    * scale-invariant, so the un-divided integer sum stands in for the
    * mean exactly — no rational centroid ever materializes).
    *
    * Scale 1e6, NOT 1e8/1e12: the QUOTIENT here is cos²·‖v‖²·S,
    * and ‖v‖² (not normalized away as in [[scoreE8]]) reaches ~1e8 on
    * a Gaussian-ish grid — at S = 1e12 the quotient could brush
    * Long.MaxValue, where Spark's `div`→LONG goes NULL silently while
    * the DuckDB twin's HUGEINT→BIGINT cast errors. At S = 1e6 the
    * quotient stays ≤ ~1e14 with orders of magnitude to spare;
    * assignment ties at the coarser grid break identically in both
    * engines (score, cluster-id) so parity is unaffected. */
  private val assignScore =
    "CASE WHEN d >= 0 THEN (CAST(d AS DECIMAL(38,0)) * d * " +
      "1000000) div CAST(s2 AS DECIMAL(38,0)) ELSE " +
      "-((CAST(d AS DECIMAL(38,0)) * d * 1000000) div " +
      "CAST(s2 AS DECIMAL(38,0))) END"

  /** PORTABLE trained-IVF top-k (sim7p): the
    * [[Similarity.ivfTrainedTopK]] algorithm — hash-seeded Lloyd
    * rounds, nearest-centroid buckets, top-p centroid multi-probe —
    * made engine-exact end to end: the seed is the md5 hash family,
    * centroids are integer member-SUM vectors (never divided — cosine
    * scale-invariance), and every assignment/probe comparison is the
    * exact rational cross-multiplication. DuckDB replays training,
    * bucketing, probe order, and final ranks bit-for-bit.
    *
    * Scale shape per Lloyd round (same as the production path): the
    * centroid table is nlist×dims integers (metadata, broadcast); the
    * corpus contributes one partial-aggregated (id, cluster) scalar
    * shuffle — the vectors themselves never re-shuffle.
    *
    * @return (query_id, rank, corpus_id, score_e8). */
  def portableIvfTrainedTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 5, idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 8, iters: Int = 2, probes: Int = 3): DataFrame = {
    require(nlist >= 2 && iters >= 1 && probes >= 1 && probes <= nlist,
      s"need nlist>=2, iters>=1, 1<=probes<=nlist")
    val qc = quantRows(corpus, idCol, vecCol).localCheckpoint()
    def centroids(assign: DataFrame): DataFrame =
      qc.join(assign, Seq("id")).groupBy(col("c"), col("pos"))
        .agg(sum(col("q")).as("s"))
        .localCheckpoint() // nlist×dims, referenced by d and s2
    // (id, c, score) vs a centroid table, for ALL ids in `rows`
    def scoresVs(rows: DataFrame, cents: DataFrame): DataFrame = {
      val s2 = cents.groupBy(col("c"))
        .agg(sum(col("s") * col("s")).as("s2"))
      rows.join(broadcast(cents), Seq("pos"))
        .groupBy(col("id"), col("c"))
        .agg(sum(col("q") * col("s")).as("d"))
        .join(broadcast(s2), Seq("c"))
        .filter(col("s2") > 0)
        .withColumn("score", expr(assignScore))
    }
    def assignTo(cents: DataFrame): DataFrame =
      scoresVs(qc, cents)
        .withColumn("rk", row_number().over(Window.partitionBy(col("id"))
          .orderBy(desc("score"), col("c"))))
        .filter(col("rk") === 1)
        .select(col("id"), col("c"))
    var assign = qc.select(col("id")).distinct()
      .withColumn("c", expr(
        s"CAST(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), " +
          s"16, 10) AS BIGINT) % $nlist AS INT)"))
    var cents: DataFrame = null
    for (_ <- 0 until iters) {
      cents = centroids(assign)
      assign = assignTo(cents).localCheckpoint()
    }
    // corpus buckets = the LAST assignment; queries probe the SAME
    // centroid table that produced it
    val qq = quantRows(queries, idCol, vecCol)
    val qprobe = scoresVs(qq, cents)
      .withColumn("rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(desc("score"), col("c"))))
      .filter(col("rk") <= probes)
      .select(col("id").as("query_id"), col("c"))
    val cand = assign.select(col("id").as("corpus_id"), col("c"))
      .join(broadcast(qprobe), Seq("c"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"))
    rankCandidates(cand, qc, k)
  }

  // ------------------------------------------------ sim8p: PQ + ADC

  /** Shifted quant rows for the PQ family: q = floor(x·1000) + 1024,
    * NON-NEGATIVE by construction (|x| ≤ ~0.6 ⇒ q ∈ [~424, ~1624]),
    * so every integer division is over non-negative operands where
    * Spark's truncating `div` and DuckDB's flooring `//` agree — and
    * L2 DISTANCES are shift-invariant, so the ranking is identical to
    * the unshifted grid's. */
  private def shiftedSubRows(corpus: DataFrame, idCol: String,
      vecCol: String, subDim: Int): DataFrame =
    corpus
      .select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("id"),
        expr(s"CAST(pos div $subDim AS INT)").as("j"),
        expr(s"CAST(pos % $subDim AS INT)").as("p"),
        expr("CAST(floor(x * 1000D) AS BIGINT) + 1024").as("q"))

  /** PORTABLE product quantization + ADC + exact re-rank (sim8p): the
    * sim8 serving shape in the ORIGINAL Jégou et al. 2011 metric (L2)
    * under exact integer arithmetic — subvector k-means codebooks
    * (integer Lloyd: centroid = sum div count over the shifted
    * non-negative grid), per-corpus-row codes, per-query ADC distance
    * tables, Σ-of-table-lookups candidate ranking, and an exact
    * integer-L2 re-rank of the top rerank·k. Every stage — training
    * included — replays bit-for-bit in DuckDB. sim8 (floats, cosine,
    * xxhash seeding) remains the production path.
    *
    * @return (query_id, rank, corpus_id, dist2) — exact squared L2 on
    *         the quantized grid. */
  def portablePqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      rerank: Int = 4): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val subDim = dims / m
    val sub = shiftedSubRows(corpus, idCol, vecCol, subDim)
      .localCheckpoint()
    var codes = sub.select(col("id"), col("j")).distinct()
      .withColumn("code", expr(
        s"CAST(CAST(conv(substring(md5(concat(CAST(id AS STRING), " +
          s"':', CAST(j AS STRING))), 1, 12), 16, 10) AS BIGINT) " +
          s"% $ksub AS INT)"))
    var cents: DataFrame = null
    for (_ <- 0 until iters) {
      // integer centroids: per (subspace, code, dim), sum div count —
      // m·ksub·subDim rows, metadata, broadcast everywhere
      cents = sub.join(codes, Seq("id", "j"))
        .groupBy(col("j"), col("code"), col("p"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("cnt"))
        .select(col("j"), col("code"), col("p"),
          expr("s div cnt").as("mu"))
        .localCheckpoint()
      // reassign: argmin exact integer L2 over the ksub codes
      codes = sub.join(broadcast(cents), Seq("j", "p"))
        .groupBy(col("id"), col("j"), col("code"))
        .agg(sum((col("q") - col("mu")) * (col("q") - col("mu")))
          .as("d2"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("id"), col("j"))
            .orderBy(col("d2"), col("code"))))
        .filter(col("rk") === 1)
        .select(col("id"), col("j"), col("code"))
        .localCheckpoint()
    }
    // per-query ADC tables vs the SAME codebooks the codes use:
    // T(query, j, code) = ||q_j − c_{j,code}||², m·ksub ints per query
    val qsub = shiftedSubRows(queries, idCol, vecCol, subDim)
    val tables = qsub.join(broadcast(cents), Seq("j", "p"))
      .groupBy(col("id").as("query_id"), col("j"), col("code"))
      .agg(sum((col("q") - col("mu")) * (col("q") - col("mu")))
        .as("t"))
    // ADC candidate ranking: Σ_j T[j][code_j(x)] — m lookups per
    // corpus row, the PQ memory-bandwidth win
    val adc = codes.join(broadcast(tables), Seq("j", "code"))
      .groupBy(col("query_id"), col("id").as("corpus_id"))
      .agg(sum(col("t")).as("adc"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc"), col("corpus_id"))))
      .filter(col("rk") <= rerank * k)
      .select(col("query_id"), col("corpus_id"))
    // exact integer-L2 re-rank of the survivors, on the family's one
    // quant grid (L2 differences are shift-invariant, so the unshifted
    // grid ranks identically to the shifted training grid)
    val qAll = quantRows(corpus, idCol, vecCol)
    adc
      .join(qAll.select(col("id").as("query_id"), col("pos"),
        col("q").as("qa")), Seq("query_id"))
      .join(qAll.select(col("id").as("corpus_id"), col("pos"),
        col("q").as("qb")), Seq("corpus_id", "pos"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum((col("qa") - col("qb")) * (col("qa") - col("qb")))
        .as("dist2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("dist2"), col("corpus_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("dist2"))
  }

  /** DuckDB twin of [[portablePqTopK]]: unrolled Lloyd generations,
    * ADC tables, Σ-lookup ranking, exact re-rank. `queryPred` filters
    * `id` (queries ⊆ corpus). */
  def portablePqTopKSql(corpusRel: String, queryPred: String,
      k: Int = 5, dims: Int = 64, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, rerank: Int = 4): String = {
    val subDim = dims / m
    def gen(i: Int): String = {
      val prev = if (i == 1) "cd0" else s"cd${i - 1}"
      s"""ct$i AS (SELECT s.j, c.code, s.p,
         |    sum(s.q) // count(*) AS mu
         |  FROM sub s JOIN $prev c ON c.id = s.id AND c.j = s.j
         |  GROUP BY 1, 2, 3),
         |cd$i AS (SELECT id, j, code FROM (
         |    SELECT s.id, s.j, ct.code, row_number() OVER (
         |      PARTITION BY s.id, s.j
         |      ORDER BY sum((s.q - ct.mu) * (s.q - ct.mu)), ct.code)
         |      AS rk
         |    FROM sub s JOIN ct$i ct ON ct.j = s.j AND ct.p = s.p
         |    GROUP BY s.id, s.j, ct.code)
         |  WHERE rk = 1)""".stripMargin
    }
    val gens = (1 to iters).map(gen).mkString(",\n")
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |q0 AS (SELECT vec_id AS id, CAST(u.i - 1 AS INT) AS pos,
       |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) *
       |      CAST('1000' AS DOUBLE)) AS BIGINT) AS q
       |  FROM corpus,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |sub AS (SELECT id, CAST(pos // $subDim AS INT) AS j,
       |    CAST(pos % $subDim AS INT) AS p, q + 1024 AS q
       |  FROM q0),
       |cd0 AS (SELECT DISTINCT id, j,
       |    CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
       |      CAST(j AS VARCHAR)), 1, 12)) AS BIGINT) % $ksub AS INT)
       |      AS code
       |  FROM sub),
       |$gens,
       |tq AS (SELECT s.id AS query_id, s.j, ct.code,
       |    sum((s.q - ct.mu) * (s.q - ct.mu)) AS t
       |  FROM sub s JOIN ct$iters ct ON ct.j = s.j AND ct.p = s.p
       |  WHERE s.$queryPred GROUP BY 1, 2, 3),
       |adc AS (SELECT query_id, corpus_id FROM (
       |    SELECT t.query_id, c.id AS corpus_id, row_number() OVER (
       |      PARTITION BY t.query_id
       |      ORDER BY sum(t.t), c.id) AS rk
       |    FROM cd$iters c JOIN tq t ON t.j = c.j AND t.code = c.code
       |    WHERE c.id <> t.query_id
       |    GROUP BY t.query_id, c.id)
       |  WHERE rk <= ${rerank * k})
       |SELECT query_id, rank, corpus_id, CAST(dist2 AS BIGINT) AS dist2
       |FROM (
       |  SELECT a.query_id, a.corpus_id,
       |    sum((qa.q - qb.q) * (qa.q - qb.q)) AS dist2,
       |    CAST(row_number() OVER (PARTITION BY a.query_id
       |      ORDER BY sum((qa.q - qb.q) * (qa.q - qb.q)),
       |        a.corpus_id) AS INT) AS rank
       |  FROM adc a
       |  JOIN q0 qa ON qa.id = a.query_id
       |  JOIN q0 qb ON qb.id = a.corpus_id AND qb.pos = qa.pos
       |  GROUP BY a.query_id, a.corpus_id)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin.replace('\n', ' ')
  }

  /** DuckDB twin of [[portableIvfTrainedTopK]] with the Lloyd rounds
    * statically unrolled (`iters` CTE generations). `queryPred`
    * filters `id` (queries ⊆ corpus). */
  def portableIvfTrainedTopKSql(corpusRel: String, queryPred: String,
      k: Int = 5, nlist: Int = 8, iters: Int = 2,
      probes: Int = 3): String = {
    val score =
      "CASE WHEN d >= 0 THEN CAST(CAST(d AS HUGEINT) * d * " +
        "1000000 // CAST(s2 AS HUGEINT) AS BIGINT) ELSE " +
        "-CAST(CAST(d AS HUGEINT) * d * 1000000 // " +
        "CAST(s2 AS HUGEINT) AS BIGINT) END"
    // one Lloyd generation: centroid sums + norms + scores + argmin
    def gen(i: Int): String = {
      val prev = if (i == 1) "a0" else s"a${i - 1}"
      s"""c$i AS (SELECT a.c, q.pos, sum(q.q) AS s
         |  FROM q JOIN $prev a USING (id) GROUP BY 1, 2),
         |n$i AS (SELECT c, sum(s * s) AS s2 FROM c$i GROUP BY 1),
         |d$i AS (SELECT q.id, cc.c, sum(q.q * cc.s) AS d
         |  FROM q JOIN c$i cc USING (pos) GROUP BY 1, 2),
         |a$i AS (SELECT id, c FROM (
         |    SELECT dd.id, dd.c, row_number() OVER (PARTITION BY dd.id
         |      ORDER BY $score DESC, dd.c) AS rk
         |    FROM d$i dd JOIN n$i USING (c) WHERE s2 > 0)
         |  WHERE rk = 1)""".stripMargin
    }
    val gens = (1 to iters).map(gen).mkString(",\n")
    s"""WITH corpus AS (SELECT * FROM $corpusRel),
       |q AS (SELECT vec_id AS id, CAST(u.i - 1 AS INT) AS pos,
       |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) *
       |      CAST('1000' AS DOUBLE)) AS BIGINT) AS q
       |  FROM corpus,
       |    unnest(generate_series(1, len(embedding))) AS u(i)),
       |a0 AS (SELECT DISTINCT id,
       |    CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12))
       |      AS BIGINT) % $nlist AS INT) AS c
       |  FROM q),
       |$gens,
       |qp AS (SELECT id AS query_id, c FROM (
       |    SELECT dd.id, dd.c, row_number() OVER (PARTITION BY dd.id
       |      ORDER BY $score DESC, dd.c) AS rk
       |    FROM d$iters dd JOIN n$iters USING (c)
       |    WHERE s2 > 0 AND ($queryPred))
       |  WHERE rk <= $probes),
       |cand AS (SELECT qp.query_id, a.id AS corpus_id
       |  FROM qp JOIN a$iters a ON a.c = qp.c
       |  WHERE a.id <> qp.query_id),
       |s AS (SELECT c.query_id, c.corpus_id, sum(qa.q * qb2.q) AS dot,
       |    sum(qa.q * qa.q) AS na2, sum(qb2.q * qb2.q) AS nb2
       |  FROM cand c
       |  JOIN q qa ON qa.id = c.query_id
       |  JOIN q qb2 ON qb2.id = c.corpus_id AND qb2.pos = qa.pos
       |  GROUP BY 1, 2),
       |scored AS (SELECT query_id, corpus_id,
       |    CASE WHEN dot >= 0
       |      THEN CAST(CAST(dot AS HUGEINT) * dot * 100000000 //
       |        (CAST(na2 AS HUGEINT) * nb2) AS BIGINT)
       |      ELSE -CAST(CAST(dot AS HUGEINT) * dot * 100000000 //
       |        (CAST(na2 AS HUGEINT) * nb2) AS BIGINT)
       |      END AS score_e8
       |  FROM s WHERE na2 > 0 AND nb2 > 0)
       |SELECT query_id, rank, corpus_id, score_e8 FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_e8 DESC, corpus_id) AS INT) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin.replace('\n', ' ')
  }
}
