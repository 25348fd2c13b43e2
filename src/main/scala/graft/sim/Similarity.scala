package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus: O(|corpus|·|queries|·dim) flops, fully
  * distributed, no shuffle of the corpus. This is the correct 100 TB plan
  * whenever |queries| is bounded (the usual case: a query batch).
  *
  * Scale path: IVF-style partition pruning — k-means-ish coarse centroids
  * via deterministic hash-bucketing stand-in (`ivfTopK`) so each query
  * probes only its nearest buckets; and random-hyperplane LSH
  * (`cosineLshBuckets`) for corpus-vs-corpus near-dup search, where a
  * cross join would be quadratic.
  *
  * All arithmetic is done in DOUBLE after casting the float vectors —
  * matching the DuckDB oracle (`list_cosine_similarity` over DOUBLE[]).
  */
object Similarity {

  /** Elementwise dot product — custom codegen'd Catalyst expression
    * (graft.expr.DotProduct): Spark's higher-order functions
    * (aggregate/zip_with) are interpreted and ~100x slower in this hot
    * loop. Sequential accumulation, deterministic floats. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (graft.expr.CosineSim): bit-identical to
    * `dot(a,b)/(norm(a)·norm(b))` but one array traversal instead of
    * three — the LSH verify's hot loop. Callers that pre-compute norms
    * once per SIDE (bruteForceTopK) keep the explicit dot/norm split,
    * which does fewer total flops when rows join many partners. */
  def cosine(a: Column, b: Column): Column =
    graft.expr.VectorExprs.cosineSim(a, b)

  /** Native Cast (codegen'd) — not a per-element transform lambda. */
  private[sim] def toDouble(c: Column): Column = c.cast("array<double>")

  /** Two-phase distributed top-k: a single row_number window partitioned
    * by query would hash ALL scored rows into only |queries| sort groups —
    * on a 1000-executor cluster with a 20-query batch, 980 cores idle.
    * Phase 1 ranks within (query, salt) — parallelism |queries|×salts —
    * and keeps k rows per salt group; phase 2 ranks the surviving
    * k×salts rows per query. The union of per-salt top-ks contains the
    * global top-k, and the (sim DESC, corpus_id) ordering is total, so
    * the result is identical to the single-window form. */
  private[sim] def topKPerQuery(scored: DataFrame, k: Int,
      salts: Int = 64, extraCols: Seq[String] = Nil): DataFrame = {
    val salted = scored.withColumn("salt",
      pmod(xxhash64(col("corpus_id")), lit(salts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(desc("sim"), col("corpus_id"))
    val partial = salted
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), col("corpus_id"))
    partial
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id") +: col("rank") +: col("corpus_id") +:
        col("sim") +: extraCols.map(col): _*)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Ranking uses the 4-decimal-rounded
    * similarity with id tie-break so results are reproducible across
    * engines and partitionings. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are computed once per row per side, not once per pair
    val c = corpus.select(col(idCol).as("corpus_id"),
      toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(
        dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm")), 4))
    topKPerQuery(scored, k)
  }

  /** DuckDB twin of [[bruteForceTopK]] for queries `WHERE <queryPred>`;
    * `corpusPred` restricts the candidate side (filtered search). */
  def bruteForceTopKSql(k: Int, queryPred: String,
      corpusPred: String = "TRUE"): String =
    s"""WITH q AS (SELECT vec_id AS query_id,
       |    CAST(embedding AS DOUBLE[]) AS qvec
       |  FROM embeddings WHERE $queryPred),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS corpus_id,
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 4)
       |      AS sim
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> q.query_id AND ($corpusPred))
       |SELECT query_id, rank, corpus_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, corpus_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin.replace('\n', ' ')

  /** Hard-negative mining for contrastive training (sim12): for each
    * anchor, the k most-similar corpus vectors whose LABEL DIFFERS —
    * "looks like the anchor, isn't the anchor's class", the negatives
    * that actually move an InfoNCE/triplet loss (random negatives are
    * trivially separable at scale). Unlike sim10's static pre-filter,
    * the exclusion here is ANCHOR-DEPENDENT (c.label ≠ q.label), so it
    * lives in the join condition, evaluated before any window. Same
    * plan as sim1: corpus never shuffles, anchors broadcast, two-phase
    * salted top-k; same 4dp-cosine + id tie-break contract. Output
    * carries both labels so the pair is self-describing for a
    * downstream triplet builder. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("neg_label"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    val q = anchors.select(col(idCol).as("query_id"),
      col(labelCol).as("anchor_label"),
      toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val scored = c.join(broadcast(q),
      col("neg_label") =!= col("anchor_label"))
      .withColumn("sim", round(
        dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm")), 4))
    topKPerQuery(scored, k,
      extraCols = Seq("anchor_label", "neg_label"))
  }

  /** DuckDB twin of [[hardNegatives]] for anchors `WHERE anchorPred`. */
  def hardNegativesSql(k: Int, anchorPred: String): String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS anchor_label,
       |    CAST(embedding AS DOUBLE[]) AS qvec
       |  FROM embeddings WHERE $anchorPred),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS corpus_id,
       |    round(list_cosine_similarity(
       |      CAST(e.embedding AS DOUBLE[]), q.qvec), 4) AS sim,
       |    q.anchor_label, e.label AS neg_label
       |  FROM embeddings e, q
       |  WHERE e.label <> q.anchor_label)
       |SELECT query_id, rank, corpus_id, sim, anchor_label, neg_label
       |FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, corpus_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin.replace('\n', ' ')

  /** Random-hyperplane LSH signature: bit b = sign(dot(v, h_b)) where the
    * hyperplane components are deterministic pseudo-randoms
    * (xxhash64(dim, bit) scaled to [-1, 1]) — no RNG state, reproducible
    * across the cluster. */
  def lshSignature(vec: Column, bits: Int = 16): Column = {
    val planes = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(i, lit(b)), lit(1000003)).cast("double") /
              lit(500001.5) - lit(1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Corpus-vs-corpus near-neighbor candidates via LSH bucket join. */
  def cosineLshBuckets(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", bits: Int = 16): DataFrame =
    corpus.select(col(idCol), lshSignature(col(vecCol), bits).as("bucket"))

  /** IVF-style top-k: coarse-quantize every vector to a bucket (here: the
    * LSH signature's low bits as a deterministic stand-in for k-means
    * centroids), then search only within the query's probed buckets.
    * Trades recall for a |corpus|/buckets fan-out reduction.
    *
    * Multi-probe (`probes` > 1): each query also searches the buckets at
    * Hamming distance 1 from its own (low bit flipped first) — the
    * standard recall recovery for vectors near a hyperplane boundary,
    * costing probes× query fan-out but never touching the corpus side.
    * Corpus rows stay in exactly one bucket, so no candidate dedup is
    * needed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 4, probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= bits + 1,
      s"probes must be in [1, bits+1]; got $probes for $bits bits")
    val c = cosineLshBuckets(corpus, idCol, vecCol, bits)
      .join(corpus, idCol)
      .select(col(idCol).as("corpus_id"), col("bucket"),
        toDouble(col(vecCol)).as("cvec"))
    val probed = (0 until probes).map {
      case 0 => col("bucket")
      case i => col("bucket").bitwiseXOR(lit(1L << (i - 1)))
    }
    val q = cosineLshBuckets(queries, idCol, vecCol, bits)
      .join(queries, idCol)
      .select(col(idCol).as("query_id"),
        explode(array(probed: _*)).as("bucket"),
        toDouble(col(vecCol)).as("qvec"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("cvec"), col("qvec")), 4))
    topKPerQuery(scored, k)
  }

  /** K-means-trained coarse quantizer for IVF: `nlist` centroids from
    * deterministic hash-seeded Lloyd iterations (no RNG — seeding is
    * `xxhash64(id) mod nlist`, so training is reproducible on any
    * cluster layout).
    *
    * Scale shape per iteration: the centroid recompute shuffles only
    * (cluster, dim) partial sums (posexplode + two metadata-sized hash
    * aggregates — the x10_centroid_assign pattern) and the re-assignment
    * broadcasts the nlist×dim centroid table against the corpus with a
    * partial-aggregating max_by — the corpus itself NEVER shuffles.
    * Centroid dims round to 6 dp so float partial-sum order can't make
    * training runs diverge. Clusters that lose all members simply drop
    * out (standard Lloyd behavior; `probes` still searches the
    * surviving ones). */
  def trainCentroids(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nlist: Int = 8,
      iters: Int = 2): DataFrame = {
    require(nlist >= 2 && iters >= 1, s"need nlist>=2, iters>=1")
    val vecs = corpus.select(col(idCol).as("__id"),
      toDouble(col(vecCol)).as("__v"))
    var assigned = vecs.withColumn("__c",
      pmod(xxhash64(col("__id")), lit(nlist)).cast("int"))
    var cents: DataFrame = null
    for (_ <- 0 until iters) {
      cents = assigned
        .select(col("__c"), posexplode(col("__v")))
        .groupBy(col("__c"), col("pos"))
        .agg(round(avg(col("col")), 6).as("m"))
        .groupBy(col("__c"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
      val best = vecs.join(broadcast(cents))
        .withColumn("sim", round(cosine(col("__v"), col("centroid")), 6))
        .groupBy(col("__id"))
        .agg(max_by(col("__c"),
          struct(col("sim"), (-col("__c")).as("n"))).as("__c"))
      assigned = vecs.join(best, "__id")
    }
    cents.select(col("__c").as("cluster"), col("centroid"))
  }

  /** IVF top-k with a TRAINED coarse quantizer: corpus vectors live in
    * their nearest-centroid bucket; each query probes its `probes`
    * nearest centroids (top-p by cosine — the trained-quantizer analogue
    * of [[ivfTopK]]'s Hamming-flip multi-probe) and exact-scores only
    * those buckets. Centroids adapt to the data distribution, so at
    * equal probed-bucket count recall ≥ the data-oblivious hyperplane
    * variant (asserted in SimilaritySpec).
    *
    * Scale: the centroid table is nlist×dim (metadata) and broadcasts
    * everywhere it appears; the query-side top-p window runs over
    * |queries|×nlist rows (query-batch-sized, never the corpus); corpus
    * rows land in exactly one bucket so no candidate dedup is needed. */
  def ivfTrainedTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 8, probes: Int = 2, iters: Int = 2): DataFrame = {
    require(probes >= 1 && probes <= nlist,
      s"probes must be in [1, nlist]; got $probes for $nlist centroids")
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters)
    val c = corpus
      .select(col(idCol).as("corpus_id"), toDouble(col(vecCol)).as("cvec"))
      .join(broadcast(cents))
      .withColumn("sim_c", round(cosine(col("cvec"), col("centroid")), 6))
      .groupBy(col("corpus_id"))
      .agg(max_by(col("cluster"),
          struct(col("sim_c"), (-col("cluster")).as("n"))).as("bucket"),
        first(col("cvec")).as("cvec"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim_c"), col("cluster"))
    val q = queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qvec"))
      .join(broadcast(cents))
      .withColumn("sim_c", round(cosine(col("qvec"), col("centroid")), 6))
      .withColumn("rk", row_number().over(qw))
      .filter(col("rk") <= probes)
      .select(col("query_id"), col("cluster").as("bucket"), col("qvec"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("cvec"), col("qvec")), 4))
    topKPerQuery(scored, k)
  }

  /** Banded LSH bucketing for corpus self-similarity: `bands` bands of
    * `bandBits` hyperplane bits each. A near-dup pair collides in a band
    * with probability (1−θ/π)^bandBits, and is a candidate if ANY band
    * collides — the same amplification trick as MinHash-LSH banding
    * (Dedup.lshCandidatePairs). With 4×8 the collision probability for
    * cosine ≥ 0.95 pairs is ≈ 0.99, while unrelated pairs almost never
    * share a band. */
  /** Signature computation for the banded self-join: posexplode + one
    * codegen'd hash aggregate (32 conditional sums), NOT the interpreted
    * higher-order-function form of [[lshSignature]] — inlining that tree
    * once per band built bands×bits aggregate chains in one projection
    * and dominated the whole bench (24 s for a 5 k-row corpus; this
    * shape, the same as Dedup.minhashSignatures, is sub-second).
    * Note the per-plane sum is a hash-aggregate partial sum, so float
    * addition order is partition-dependent; a sign flip would need
    * |projection| ≲ 1e-12, and candidates are exact-verified anyway. */
  private def bandedBuckets(corpus: DataFrame, idCol: String,
      vecCol: String, bands: Int, bandBits: Int): DataFrame = {
    require(bands >= 1 && bandBits >= 1 && bandBits <= 62,
      s"need 1 <= bandBits <= 62 per 64-bit band word; got " +
        s"bands=$bands bandBits=$bandBits")
    val bits = bands * bandBits
    val vecs = corpus.select(col(idCol), toDouble(col(vecCol)).as("v"))
    val exploded = vecs.select(col(idCol), posexplode(col("v")))
    val planeSums = (0 until bits).map { b =>
      sum(col("col") *
        (pmod(xxhash64(col("pos"), lit(b)), lit(1000003)).cast("double") /
          lit(500001.5) - lit(1.0))).as(s"p_$b")
    }
    val projs = exploded.groupBy(col(idCol))
      .agg(planeSums.head, planeSums.tail: _*)
    // ONE 64-bit word PER BAND (sig: array<bigint>): bands × bandBits
    // is not capped by a single packed long, so the SCALE.md guidance
    // (20-24 bandBits at 10^9 vectors, recall bought back with more
    // bands) is actually expressible. Plane j of band b is global
    // hyperplane b·bandBits+j — identical planes and buckets to the
    // old single-word packing at the 4×8 default.
    val words = (0 until bands).map { b =>
      (0 until bandBits).map { j =>
        val plane = b * bandBits + j
        when(col(s"p_$plane") >= 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c)).as(s"w_$b")
    }
    val sigs = projs
      .select((col(idCol) +: words): _*)
      .withColumn("sig",
        array((0 until bands).map(b => col(s"w_$b")): _*))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), col(s"w_$b").as("bucket"))
    }
    // scalars ONLY ride the band explosion — (id, sig, band, bucket),
    // never the vector: the candidate join shuffles bands × 24 B/row
    // instead of bands × the full double vector
    sigs
      .select(col(idCol), col("sig"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  /** Scale path for embedding near-dup: candidates from a banded-LSH
    * bucket self-join (never a cross join — same shape as
    * Dedup.simhashNearPairs), a signature-Hamming prefilter, then an
    * exact-cosine verify on the survivors. Approximate only in recall
    * (a pair colliding in no band is missed; the +4σ Hamming cut adds
    * ≤ ~3e-5); every emitted pair is exact-verified. The band
    * explosion and the bucket self-join carry SCALARS only (id + one
    * 64-bit word per band); vectors join back once for the verify leg.
    * The per-bucket self-join is quadratic only within a bucket, and
    * hyperplane buckets split the corpus ~uniformly (data-independent),
    * so no bucket is corpus-sized — at larger corpora raise `bandBits`
    * so the per-band bucket count ~tracks corpus size (expected bucket
    * occupancy n/2^bandBits stays O(1): 20–24 bits at 10^9 vectors;
    * recall lost to narrower buckets is bought back with more bands —
    * the per-band signature words make any (bands, bandBits ≤ 62)
    * expressible, not just combinations packing into one long). */
  def cosineLshNearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 4, bandBits: Int = 8): DataFrame = {
    val bits = bands * bandBits
    val blocked = bandedBuckets(corpus, idCol, vecCol, bands, bandBits)
    // candidate generation is SCALAR end to end: bucket self-join on
    // (band, bucket) over (id, sig) rows, distinct BEFORE any vector
    // is fetched (a pair colliding in several bands verifies once)
    val candScalar = blocked
      .select(col("band"), col("bucket"),
        col(idCol).as("id_a"), col("sig").as("sig_a"))
      .join(blocked.select(col("band"), col("bucket"),
        col(idCol).as("id_b"), col("sig").as("sig_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
    // signature-Hamming prefilter before the exact-cosine verify: a
    // pair at cosine ≥ t disagrees on each hyperplane bit with
    // p = acos(t)/π, so its Hamming distance over `bits` bits is
    // Binomial(bits, p) — cut at mean + 4σ (recall loss ≤ ~3e-5 by the
    // normal tail, far inside SimilaritySpec's 0.9 planted floor) so
    // clearly-unrelated bucket collisions never reach the 64-dim dot
    val p = math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val maxHam = math.min(bits.toDouble,
      math.ceil(bits * p + 4.0 * math.sqrt(bits * p * (1 - p)))).toLong
    val cand = candScalar
      .filter(aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), (acc, x) => acc + x) <= maxHam)
      .select(col("id_a"), col("id_b"))
    // vectors join back ONCE, only for surviving candidates — at
    // corpus scale the heavy payload never rides the band explosion
    val vecs = corpus.select(col(idCol), toDouble(col(vecCol)).as("v"))
    cand
      .join(vecs.select(col(idCol).as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (corpus self-similarity ≥
    * threshold). Exact all-pairs is inherently O(n²): it is only run when
    * the corpus is small enough to broadcast (≤ `bruteMaxRows`, checked
    * with a real count); larger corpora route to the banded-LSH
    * candidate + exact-verify path, which is the 100 TB plan. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bruteMaxRows: Long = 100000L): DataFrame = {
    if (corpus.count() > bruteMaxRows)
      return cosineLshNearDupPairs(corpus, threshold, idCol, vecCol)
    val a = corpus.select(col(idCol).as("id_a"),
      toDouble(col(vecCol)).as("va"))
      .withColumn("na", norm(col("va")))
    val b = corpus.select(col(idCol).as("id_b"),
      toDouble(col(vecCol)).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", round(
        dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Symmetric per-vector int8 scalar quantization — the standard
    * embedding-compression step before ANN at corpus scale (4× smaller
    * than float32, 8× than the double working form; distance error is
    * bounded by the per-dim step maxabs/127). q_i = round(x_i·127/maxabs)
    * ∈ [−127, 127]; an all-zero vector quantizes to zeros. Pure per-row
    * expression work (no shuffle, no UDF); the division is guarded with
    * nullif so the zero-vector case can't divide by zero. */
  def quantizeInt8(df: DataFrame, vecCol: String,
      maxAbsName: String = "max_abs", qName: String = "q"): DataFrame = {
    // Two-projection shape: maxabs materializes as an attribute BEFORE
    // the per-element lambda consumes it. Inlined, the O(d) array_max
    // fold re-executes once per element — O(d²) per row, the same
    // HOF-inlining trap as bandedBuckets / bigramLogProb. The attribute
    // is referenced twice downstream (output + lambda), so
    // CollapseProject keeps the boundary.
    val v = col(vecCol).cast("array<double>")
    df.withColumn(maxAbsName, array_max(transform(v, x => abs(x))))
      .withColumn(qName, transform(v, x =>
        coalesce(round(x * lit(127.0) /
          nullif(col(maxAbsName), lit(0.0))), lit(0.0))
          .cast("tinyint")))
  }

  /** DuckDB twin of [[quantizeInt8]] over `embeddings` — identical
    * double-precision operand order (x·127/maxabs) so IEEE results agree
    * exactly; both engines round ties away from zero. */
  def quantizeInt8Sql: String =
    """SELECT vec_id, round(mx, 6) AS max_abs,
      |  array_to_string(list_transform(v, x -> CAST(coalesce(
      |    round(x * 127.0 / nullif(mx, 0.0)), 0.0) AS TINYINT)), ',') AS q
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |  list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> abs(x))) AS mx FROM embeddings)
      |ORDER BY vec_id""".stripMargin.replace('\n', ' ')

  /** L2 normalization to unit vectors — the preprocessing step that
    * turns cosine similarity into a plain dot product (ANN indexes and
    * the int8 path both want unit inputs). Pure higher-order-function
    * row math (codegen'd fold + transform — no UDF, no shuffle, runs at
    * scan speed); zero vectors yield null components instead of a
    * division blow-up. */
  def l2Normalize(df: DataFrame, vecCol: String,
      normName: String = "norm", unitName: String = "unit"): DataFrame = {
    // Same two-projection shape as [[quantizeInt8]]: the O(d) sum-of-
    // squares fold binds to an attribute before the per-element divide —
    // inlined in the lambda it would re-run per element (O(d²) per row).
    val v = col(vecCol).cast("array<double>")
    df.withColumn(normName,
        sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(unitName,
        transform(v, x => x / nullif(col(normName), lit(0.0))))
  }

  /** DuckDB twin of [[l2Normalize]]: the sum-of-squares folds in array
    * order in both engines, every divide has identical operands, and
    * components render at 6 dp (the format_string/printf precedent from
    * the gold arrays). */
  def l2NormalizeSql: String =
    """SELECT vec_id, round(nrm, 6) AS norm,
      |  array_to_string(list_transform(v,
      |    x -> printf('%.6f', x / nullif(nrm, 0.0))), ',') AS unit
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x * x))) AS nrm FROM embeddings)
      |ORDER BY vec_id""".stripMargin.replace('\n', ' ')

  // ------------------------------------------------ product quantization

  /** Subspace decomposition for PQ: one row per (vector, subspace) with
    * the dsub-dim subvector. The full array is an attribute before the
    * transform lambda (the HOF-inlining trap — see bandedBuckets). */
  private def pqSubvectors(vecs: DataFrame, m: Int,
      dsub: Int): DataFrame =
    vecs.select(col("__id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__v"), j * dsub + lit(1), lit(dsub)))))
      .select(col("__id"), col("pos").as("j"), col("col").as("sv"))

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011, "Product
    * Quantization for Nearest Neighbor Search"): the space splits into
    * `m` contiguous subspaces of dims/m coordinates, each trained to its
    * own `ksub`-centroid codebook with the same deterministic
    * hash-seeded Lloyd loop as [[trainCentroids]]. All m codebooks train
    * JOINTLY in one plan — the subspace index is just another grouping
    * column, so iteration cost is independent of m. Assignment minimizes
    * L2 via the half-norm trick: argmin_c |s−c|² = argmax_c (s·c −
    * |c|²/2); |s|² is assignment-invariant and never computed.
    *
    * Scale per iteration (inherited from trainCentroids): the recompute
    * shuffles only (j, code, dim) partial sums; reassignment broadcasts
    * the m×ksub codebook table against the corpus — the corpus never
    * shuffles. Input `vecs` must be (__id, __v: array<double>). */
  def pqTrainCodebooks(vecs: DataFrame, dims: Int, m: Int = 8,
      ksub: Int = 16, iters: Int = 2): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val subs = pqSubvectors(vecs, m, dims / m)
    var assigned = subs.withColumn("code",
      pmod(xxhash64(col("__id"), col("j")), lit(ksub)).cast("int"))
    var books: DataFrame = null
    for (_ <- 0 until iters) {
      books = assigned
        .select(col("j"), col("code"), posexplode(col("sv")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(round(avg(col("col")), 6).as("mu"))
        .groupBy(col("j"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mu")))),
          x => x.getField("mu")).as("centroid"))
      val best = subs.join(broadcast(books), Seq("j"))
        .withColumn("score",
          round(dot(col("sv"), col("centroid")) -
            dot(col("centroid"), col("centroid")) / 2, 6))
        .groupBy(col("__id"), col("j"))
        .agg(max_by(col("code"),
          struct(col("score"), (-col("code")).as("n"))).as("code"))
      assigned = subs.join(best, Seq("__id", "j"))
    }
    books
  }

  /** PQ top-k with asymmetric distance computation (ADC) + exact
    * re-rank — the serving shape of every billion-scale ANN system:
    *
    *  1. L2-normalize both sides, so dot ordering = cosine ordering;
    *  2. encode each corpus vector ONCE as m small codes (m×ksub
    *     codebook broadcast; the encoded corpus is m ints per vector —
    *     a ~dims·4/m× compression of the index);
    *  3. per query, precompute the m×ksub table of subvector·centroid
    *     dots (metadata-sized, broadcast with the query batch);
    *  4. approx dot(q,x) = Σ_j T_q[j][code_j(x)] — m table lookups per
    *     corpus row instead of a dims-dim dot (the memory-bandwidth
    *     win); the Σ folds in fixed j order over 6-dp-rounded entries,
    *     so scores are bit-deterministic;
    *  5. the top `rerank`·k ADC candidates per query re-score exactly
    *     and the final top-k returns in bruteForceTopK's output shape.
    *
    * Codebook codes can drop out when a Lloyd cluster empties; the
    * query tables index by CODE VALUE (dense ksub-slot rows built from
    * a code→dot map), so surviving codes keep their slots. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      dims: Int = 64, m: Int = 8, ksub: Int = 16, iters: Int = 2,
      rerank: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dsub = dims / m
    def unit(df: DataFrame): DataFrame =
      l2Normalize(df.select(col(idCol), col(vecCol)), vecCol)
        .select(col(idCol).as("__id"), col("unit").as("__v"))
    val cu = unit(corpus)
    val qu = unit(queries)
    val books = pqTrainCodebooks(cu, dims, m, ksub, iters)
    val assign = pqSubvectors(cu, m, dsub)
      .join(broadcast(books), Seq("j"))
      .withColumn("score",
        round(dot(col("sv"), col("centroid")) -
          dot(col("centroid"), col("centroid")) / 2, 6))
      .groupBy(col("__id"), col("j"))
      .agg(max_by(col("code"),
        struct(col("score"), (-col("code")).as("n"))).as("code"))
    val codes = assign
      .groupBy(col("__id"))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("code")))),
        x => x.getField("code")).as("codes"))
      .select(col("__id").as("corpus_id"), col("codes"))
    val qtab = pqSubvectors(qu, m, dsub)
      .join(broadcast(books), Seq("j"))
      .withColumn("qdot", round(dot(col("sv"), col("centroid")), 6))
      .groupBy(col("__id"), col("j"))
      .agg(map_from_entries(
        collect_list(struct(col("code"), col("qdot")))).as("mp"))
      .withColumn("trow",
        transform(sequence(lit(0), lit(ksub - 1)),
          c => element_at(col("mp"), c)))
      .groupBy(col("__id"))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("trow")))),
        x => x.getField("trow")).as("qtab"))
      .select(col("__id").as("query_id"), col("qtab"))
    val adc = codes.crossJoin(broadcast(qtab))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", aggregate(
        zip_with(col("codes"), col("qtab"),
          (c, row) => element_at(row, c + 1)),
        lit(0.0), (acc, x) => acc + x))
    val cands = topKPerQuery(adc, k * rerank)
      .select(col("query_id"), col("corpus_id"))
    // exact re-rank on the RAW vectors with the same rounded-cosine
    // expression as ivfTrainedTopK/bruteForceTopK, so emitted scores are
    // identical to theirs wherever the same pair appears
    val exact = cands
      .join(corpus.select(col(idCol).as("corpus_id"),
        toDouble(col(vecCol)).as("cvec")), "corpus_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qvec"))), "query_id")
      .withColumn("sim", round(cosine(col("cvec"), col("qvec")), 4))
    topKPerQuery(exact, k)
  }

  def cosineNearDupPairsSql(threshold: Double): String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |    CAST(b.embedding AS DOUBLE[])), 4) AS sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])), 4) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin.replace('\n', ' ')

  // -------------------------------------------------------------- MMR

  /** Shared MMR score: λ·relevance − λ·max-sim-to-selected over the
    * 4dp-rounded cosines, identical text in both engines (round 1
    * feeds ms = 0, so the formula never branches). */
  private def mmrScore(lambda: Double): String =
    s"round(CAST('$lambda' AS DOUBLE) * rel " +
      s"- CAST('${1 - lambda}' AS DOUBLE) * ms, 6)"

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * 1998): greedy top-`k` from each query's `poolK` nearest
    * neighbors, each round picking argmax of λ·rel − (1−λ)·max
    * similarity to the already-selected set — the diversity pass a
    * retrieval stack runs between ANN candidates and the final
    * answer, so near-duplicate hits don't crowd out coverage.
    *
    * Determinism: relevance and in-pool pairwise cosines round to
    * 4 dp first (the sim1 convention), the MMR score is one shared
    * double expression at 6 dp, and every argmax breaks ties by
    * corpus_id — the oracle replays the identical k greedy rounds as
    * unrolled CTEs.
    *
    * Scale: the candidate pool caps the quadratic stage at poolK²
    * pairs PER QUERY (never corpus-sized); each greedy round is an
    * anti-join + a pool-sized aggregate + one per-query window over
    * ≤ poolK rows, localCheckpointed so round r never recomputes
    * rounds 1..r−1. */
  /** Deterministic label-centroid IVF top-k — sim11's ANN leg: the
    * d12 clustering recipe (per-label per-dim 6-dp mean centroids,
    * 4-dp-cosine argmax assignment with label-asc tie-break) used as
    * IVF cells; a query probes its top-`probes` centroids and
    * searches ONLY those cells. Unlike sim2/sim7/sim8 (xxhash-seeded,
    * rows-only), every step here is engine-replayable — which is what
    * lets the RECALL REPORT over it be oracle-hash-checked end to
    * end. Same scale shape as trained IVF: |labels|-row broadcast
    * centroid table, corpus touched once for assignment, per-query
    * fan-out |corpus|·probes/nlist. */
  def labelCentroidIvfTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 5, probes: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val cents = corpus
      .select(col(labelCol).as("cl"), posexplode(col(vecCol)))
      .groupBy(col("cl"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("dim_avg"))
      .groupBy(col("cl"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
        x => x.getField("dim_avg")).as("centroid"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      toDouble(col(vecCol)).as("cvec"))
    val cells = c.join(broadcast(cents))
      .withColumn("csim",
        round(cosine(col("cvec"), col("centroid")), 4))
      .groupBy(col("corpus_id"))
      .agg(max_by(col("cl"),
        struct(col("csim"), (-col("cl")).as("neg"))).as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val probed = q.join(broadcast(cents))
      .withColumn("psim",
        round(cosine(col("qvec"), col("centroid")), 4))
      .withColumn("pr", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(desc("psim"), col("cl"))))
      .filter(col("pr") <= probes)
      .select(col("query_id"), col("qvec"), col("qnorm"),
        col("cl").as("cell"))
    val scored = cells.join(c, Seq("corpus_id"))
      .withColumn("cnorm", norm(col("cvec")))
      .join(probed, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(
        dot(col("cvec"), col("qvec")) / (col("cnorm") * col("qnorm")),
        4))
    topKPerQuery(scored, k)
  }

  /** DuckDB twin of [[labelCentroidIvfTopK]] (embeddings table).
    * `seedPred` restricts centroid TRAINING rows only (the sim14
    * frozen-quantizer lifecycle: centroids from the seed, cells over
    * the whole grown corpus); the default trains on everything,
    * matching [[labelCentroidIvfTopK]]. */
  def labelCentroidIvfTopKSql(k: Int, probes: Int,
      queryPred: String, seedPred: String = "TRUE"): String =
    s"""ex AS (SELECT label AS cl,
       |    generate_subscripts(embedding, 1) - 1 AS pos,
       |    unnest(embedding) AS val
       |  FROM embeddings WHERE $seedPred),
       |dims AS (SELECT cl, pos, round(avg(CAST(val AS DOUBLE)), 6)
       |    AS dim_avg FROM ex GROUP BY 1, 2),
       |cents AS (SELECT cl, list(dim_avg ORDER BY pos) AS centroid
       |  FROM dims GROUP BY cl),
       |cv AS (SELECT vec_id AS corpus_id,
       |    CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
       |cells AS (SELECT corpus_id, cl AS cell FROM (
       |    SELECT c.corpus_id, ce.cl, row_number() OVER (
       |      PARTITION BY c.corpus_id ORDER BY
       |      round(list_cosine_similarity(c.cvec, ce.centroid), 4)
       |        DESC, ce.cl) AS rn
       |    FROM cv c, cents ce) WHERE rn = 1),
       |qv AS (SELECT vec_id AS query_id,
       |    CAST(embedding AS DOUBLE[]) AS qvec
       |  FROM embeddings WHERE $queryPred),
       |probed AS (SELECT query_id, qvec, cell FROM (
       |    SELECT q.query_id, q.qvec, ce.cl AS cell, row_number()
       |      OVER (PARTITION BY q.query_id ORDER BY
       |      round(list_cosine_similarity(q.qvec, ce.centroid), 4)
       |        DESC, ce.cl) AS rn
       |    FROM qv q, cents ce) WHERE rn <= $probes),
       |ann_scored AS (SELECT p.query_id, s.corpus_id,
       |    round(list_cosine_similarity(c2.cvec, p.qvec), 4) AS sim
       |  FROM probed p JOIN cells s ON s.cell = p.cell
       |  JOIN cv c2 ON c2.corpus_id = s.corpus_id
       |  WHERE s.corpus_id <> p.query_id),
       |ann AS (SELECT query_id, rank, corpus_id, sim FROM (
       |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, corpus_id) AS INT) AS rank
       |    FROM ann_scored) WHERE rank <= $k)""".stripMargin
      .replace('\n', ' ')

  /** Measured ANN-quality report (sim11, round-8 VERDICT ask #7):
    * per query, recall@k of `ann` against the brute-force `truth`
    * plus the similarity-mass ratio — the artifact that certifies an
    * ANN configuration before it serves. Both inputs are
    * (query_id, rank, corpus_id, sim) top-k frames. All outputs are
    * exact integers (e4 = value×10⁴, half-away division on
    * non-negative div operands — the round-8 discipline), so with a
    * deterministic ANN leg the whole report hash-checks against the
    * oracle. */
  def annRecallReport(truth: DataFrame, ann: DataFrame): DataFrame = {
    val t = truth.groupBy(col("query_id")).agg(
      count(lit(1)).as("truth_k"),
      sum(col("sim").cast("decimal(18,4)")).as("ts"))
    val a = ann.groupBy(col("query_id")).agg(
      count(lit(1)).as("ann_k"),
      sum(col("sim").cast("decimal(18,4)")).as("asum"))
    val ov = truth.select(col("query_id"), col("corpus_id"))
      .join(ann.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
    t.join(a, Seq("query_id"), "left")
      .join(ov, Seq("query_id"), "left")
      .select(col("query_id"), col("truth_k"),
        coalesce(col("ann_k"), lit(0L)).as("ann_k"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr("(2 * coalesce(n_overlap, 0) * 10000 + truth_k) div " +
          "(2 * truth_k)").as("recall_e4"),
        expr("CAST(ts * 10000 AS BIGINT)").as("truth_sim_e4"),
        expr("CAST(coalesce(asum * 10000, 0) AS BIGINT)")
          .as("ann_sim_e4"),
        expr("""CASE WHEN CAST(ts * 10000 AS BIGINT) > 0 THEN
          CASE WHEN coalesce(asum, 0) >= 0 THEN
            (2 * CAST(coalesce(asum * 10000, 0) AS BIGINT) * 10000
              + CAST(ts * 10000 AS BIGINT))
            div (2 * CAST(ts * 10000 AS BIGINT))
          ELSE -((2 * -CAST(coalesce(asum * 10000, 0) AS BIGINT) * 10000
              + CAST(ts * 10000 AS BIGINT))
            div (2 * CAST(ts * 10000 AS BIGINT)))
          END END""").as("sim_ratio_e4"))
      .orderBy("query_id")
  }

  /** DuckDB twin of [[annRecallReport]]: `truthCte` and `annCte` must
    * be CTE names yielding (query_id, rank, corpus_id, sim). */
  def annRecallReportSql(truthCte: String, annCte: String): String =
    s"""rt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS truth_k,
       |    CAST(sum(CAST(sim AS DECIMAL(18,4))) * 10000 AS BIGINT)
       |      AS ts
       |  FROM $truthCte GROUP BY 1),
       |ra AS (SELECT query_id, CAST(count(*) AS BIGINT) AS ann_k,
       |    CAST(sum(CAST(sim AS DECIMAL(18,4))) * 10000 AS BIGINT)
       |      AS asum
       |  FROM $annCte GROUP BY 1),
       |ro AS (SELECT t.query_id,
       |    CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM $truthCte t JOIN $annCte a
       |    ON a.query_id = t.query_id AND a.corpus_id = t.corpus_id
       |  GROUP BY 1),
       |rep AS (SELECT rt.query_id, rt.truth_k,
       |    coalesce(ra.ann_k, 0) AS ann_k,
       |    coalesce(ro.n_overlap, 0) AS n_overlap,
       |    CAST((2 * coalesce(ro.n_overlap, 0) * 10000 + rt.truth_k)
       |      // (2 * rt.truth_k) AS BIGINT) AS recall_e4,
       |    rt.ts AS truth_sim_e4,
       |    coalesce(ra.asum, 0) AS ann_sim_e4,
       |    CAST(CASE WHEN rt.ts > 0 THEN
       |      CASE WHEN coalesce(ra.asum, 0) >= 0 THEN
       |        (2 * coalesce(ra.asum, 0) * 10000 + rt.ts)
       |          // (2 * rt.ts)
       |      ELSE -((2 * -coalesce(ra.asum, 0) * 10000 + rt.ts)
       |          // (2 * rt.ts))
       |      END END AS BIGINT) AS sim_ratio_e4
       |  FROM rt LEFT JOIN ra ON ra.query_id = rt.query_id
       |  LEFT JOIN ro ON ro.query_id = rt.query_id)""".stripMargin
      .replace('\n', ' ')

  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      poolK: Int = 20, lambda: Double = 0.5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = bruteForceTopK(corpus, queries, poolK, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"), col("sim").as("rel"))
      .localCheckpoint()
    val vecs = corpus.select(col(idCol).as("vid"),
      toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = cand.join(vecs, col("corpus_id") === col("vid"))
      .select(col("query_id"), col("corpus_id").as("id1"),
        col("v").as("v1"), col("nrm").as("n1"))
    val b = cand.join(vecs, col("corpus_id") === col("vid"))
      .select(col("query_id").as("q2"), col("corpus_id").as("id2"),
        col("v").as("v2"), col("nrm").as("n2"))
    val pairSim = a.join(b,
      col("query_id") === col("q2") && col("id1") =!= col("id2"))
      .select(col("query_id"), col("id1"), col("id2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4)
          .as("psim"))
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("corpus_id"))
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val remaining =
        if (r == 1) cand
        else cand.join(selected.select("query_id", "corpus_id"),
          Seq("query_id", "corpus_id"), "left_anti")
      val withMs =
        if (r == 1) remaining.withColumn("ms", lit(0.0))
        else {
          val ms = pairSim
            .join(selected.select(col("query_id").as("sq"),
              col("corpus_id").as("sid")),
              pairSim("query_id") === col("sq") &&
                pairSim("id2") === col("sid"))
            .groupBy(pairSim("query_id").as("mq"), col("id1"))
            .agg(max(col("psim")).as("ms"))
          remaining.join(ms,
            remaining("query_id") === col("mq") &&
              remaining("corpus_id") === col("id1"))
            .select(remaining("query_id"), col("corpus_id"), col("rel"),
              col("ms"))
        }
      val pick = withMs
        .withColumn("score", expr(mmrScore(lambda)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(r).as("rank"), col("corpus_id"),
          col("score"))
        .localCheckpoint()
      selected =
        if (r == 1) pick
        else {
          val grown = selected.unionAll(pick).localCheckpoint()
          // superseded union round + this round's pick (folded into
          // grown) are dead — release eagerly (see Checkpoints.free)
          graft.util.Checkpoints.free(selected)
          graft.util.Checkpoints.free(pick)
          grown
        }
    }
    // the returned plan references only the final checkpointed
    // `selected`; the candidate pool and pair-sim frames are dead
    graft.util.Checkpoints.free(cand)
    graft.util.Checkpoints.free(pairSim)
    selected.orderBy("query_id", "rank")
  }

  /** DuckDB twin of [[mmrRerank]] for queries `WHERE <queryPred>`:
    * the same k greedy rounds as unrolled CTEs. */
  def mmrRerankSql(queryPred: String, k: Int = 5, poolK: Int = 20,
      lambda: Double = 0.5): String = {
    val score = mmrScore(lambda)
    val pre =
      s"""cand AS (SELECT query_id, corpus_id, sim AS rel
         |  FROM (${bruteForceTopKSql(poolK, queryPred)})),
         |ps AS (SELECT a.query_id, a.corpus_id AS id1,
         |    b.corpus_id AS id2,
         |    round(list_cosine_similarity(
         |      CAST(e1.embedding AS DOUBLE[]),
         |      CAST(e2.embedding AS DOUBLE[])), 4) AS psim
         |  FROM cand a
         |  JOIN cand b ON a.query_id = b.query_id
         |    AND a.corpus_id <> b.corpus_id
         |  JOIN embeddings e1 ON e1.vec_id = a.corpus_id
         |  JOIN embeddings e2 ON e2.vec_id = b.corpus_id),
         |sel1 AS (SELECT query_id, CAST(1 AS INT) AS rank, corpus_id,
         |    score FROM (
         |  SELECT query_id, corpus_id, score, row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, corpus_id)
         |      AS rn
         |  FROM (SELECT query_id, corpus_id,
         |      CAST('0' AS DOUBLE) AS ms, rel, $score AS score
         |    FROM cand)) WHERE rn = 1),
         |p1 AS (SELECT * FROM sel1)""".stripMargin.replace('\n', ' ')
    val rounds = (2 to k).map { r =>
      s"""m$r AS (SELECT p.query_id, p.id1, max(p.psim) AS ms
         |  FROM ps p JOIN p${r - 1} s ON p.query_id = s.query_id
         |    AND p.id2 = s.corpus_id
         |  GROUP BY 1, 2),
         |sel$r AS (SELECT query_id, CAST($r AS INT) AS rank,
         |    corpus_id, score FROM (
         |  SELECT query_id, corpus_id, score, row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, corpus_id)
         |      AS rn
         |  FROM (SELECT c.query_id, c.corpus_id, m.ms, c.rel,
         |      $score AS score
         |    FROM cand c JOIN m$r m ON m.query_id = c.query_id
         |      AND m.id1 = c.corpus_id
         |    WHERE NOT EXISTS (SELECT 1 FROM p${r - 1} s
         |      WHERE s.query_id = c.query_id
         |        AND s.corpus_id = c.corpus_id)))
         |  WHERE rn = 1),
         |p$r AS (SELECT * FROM p${r - 1}
         |  UNION ALL SELECT * FROM sel$r)"""
        .stripMargin.replace('\n', ' ')
    }.mkString(", ")
    s"WITH $pre, $rounds SELECT query_id, rank, corpus_id, score " +
      s"FROM p$k ORDER BY query_id, rank"
  }

  // ---------------------------------------- embedding centroid drift (sim13)

  /** Per-label embedding-centroid drift (sim13) — the embedding-space
    * monitor every production vector pipeline runs after a model or
    * upstream-data change: for each label (class / source / tenant),
    * the cosine between the reference batch's centroid and the current
    * batch's. A re-embedding that rotates one class's region moves its
    * centroid cosine off 1.0 long before any scalar profile (dq10) or
    * distribution test on a single coordinate (dq11) reacts.
    *
    * Input grain: quantized coordinate rows (label, src 0|1, pos, q)
    * — one posexplode per batch, coordinates quantized to e6 integers
    * via floor on the SAME IEEE double tree in both engines (floor of
    * identical doubles is identical — the round(double,n) trap does
    * not apply). Centroid cosine is computed on the per-coordinate SUM
    * vectors (cosine is scale-invariant: cos(s/n₁, s'/n₂) =
    * cos(s, s')), so no mean division ever happens: dot and norms²
    * are EXACT integers in DECIMAL(38,0)/HUGEINT. The one double
    * expression is the x87 discipline — two correctly-rounded IEEE
    * sqrts + one division + one floor, identical tree both engines.
    *
    * Scale: one pass per batch to (label, pos, partial sums) — fully
    * map-side-combinable, dim·|labels| result rows; nothing pairwise,
    * nothing collected. Headroom: s ≈ n·10⁶ per coordinate keeps
    * Σ s·s' inside 38 digits to n ≈ 10¹² rows per (label, batch). */
  def centroidDrift(rows: DataFrame,
      thresholdE6: Long = 999000L): DataFrame = {
    val s = rows.groupBy(col("label"), col("pos")).agg(
      sum(when(col("src") === 0, col("q")).otherwise(0L))
        .cast("decimal(38,0)").as("s0"),
      sum(when(col("src") === 1, col("q")).otherwise(0L))
        .cast("decimal(38,0)").as("s1"),
      sum(when(col("src") === 0 && col("pos") === 0, 1L).otherwise(0L))
        .as("nr"),
      sum(when(col("src") === 1 && col("pos") === 0, 1L).otherwise(0L))
        .as("nc"))
    s.groupBy(col("label")).agg(
      sum(col("nr")).as("n_ref"), sum(col("nc")).as("n_cur"),
      sum(col("s0") * col("s1")).as("dot"),
      sum(col("s0") * col("s0")).as("q1"),
      sum(col("s1") * col("s1")).as("q2"))
      .select(col("label"), col("n_ref").cast("long").as("n_ref"),
        col("n_cur").cast("long").as("n_cur"),
        expr("CASE WHEN q1 > 0 AND q2 > 0 THEN " +
          "CAST(floor(CAST(dot AS DOUBLE) / (sqrt(CAST(q1 AS DOUBLE)) * " +
          "sqrt(CAST(q2 AS DOUBLE))) * 1000000D) AS BIGINT) END")
          .as("cos_e6"))
      .withColumn("drifted",
        coalesce(col("cos_e6") < thresholdE6, lit(true)))
      .orderBy("label")
  }

  /** DuckDB twin of [[centroidDrift]]; `rowsRel` yields
    * (label, src, pos, q). */
  def centroidDriftSql(rowsRel: String,
      thresholdE6: Long = 999000L): String = {
    val cosE6 = "CASE WHEN q1 > 0 AND q2 > 0 THEN " +
      "CAST(floor(CAST(dot AS DOUBLE) / (sqrt(CAST(q1 AS DOUBLE)) * " +
      "sqrt(CAST(q2 AS DOUBLE))) * CAST('1000000' AS DOUBLE)) " +
      "AS BIGINT) END"
    s"""WITH s AS (SELECT label, pos,
       |    CAST(sum(CASE WHEN src = 0 THEN q ELSE 0 END) AS HUGEINT)
       |      AS s0,
       |    CAST(sum(CASE WHEN src = 1 THEN q ELSE 0 END) AS HUGEINT)
       |      AS s1,
       |    sum(CASE WHEN src = 0 AND pos = 0 THEN 1 ELSE 0 END) AS nr,
       |    sum(CASE WHEN src = 1 AND pos = 0 THEN 1 ELSE 0 END) AS nc
       |  FROM $rowsRel GROUP BY 1, 2),
       |a AS (SELECT label, sum(nr) AS n_ref, sum(nc) AS n_cur,
       |    sum(s0 * s1) AS dot, sum(s0 * s0) AS q1, sum(s1 * s1) AS q2
       |  FROM s GROUP BY 1)
       |SELECT label, CAST(n_ref AS BIGINT) AS n_ref,
       |  CAST(n_cur AS BIGINT) AS n_cur, $cosE6 AS cos_e6,
       |  coalesce(($cosE6) < $thresholdE6, TRUE) AS drifted
       |FROM a ORDER BY label""".stripMargin.replace('\n', ' ')
  }
}
