package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.table
import graft.sim.Similarity

/** Registry + oracles for similarity search over `embeddings`.
  * sim1/sim3 have DuckDB twins (cosine over DOUBLE[], rounded to 4
  * decimals; ranking ties broken by id so top-k is deterministic).
  * sim2 (IVF/LSH bucketed) uses xxhash64-derived hyperplanes → rows-only
  * check + ScalaTest recall assertion vs. the brute-force baseline. */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hybrid retrieval: BM25 lexical top-50 and embedding-cosine top-50
    // fused by reciprocal-rank fusion, rrf = Σ 1/(60 + rank) — the
    // standard two-retriever serving stack (sparse + dense) in one
    // plan. Both component lists are deterministic total orders, the
    // fusion windows run over ≤50 rows, and every double is a single
    // int/int division — fully oracle-checkable end to end.
    "rrf1_hybrid_search" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 50
      val lex = graft.text.TextAnalysis.bm25TopK(
          table(s, d, "documents"), TextQueries.bm25Query, k = k)
        .withColumn("r_lex", row_number().over(
          Window.orderBy(desc("bm25"), col("doc_id"))))
        .select(col("doc_id").as("id"), col("r_lex"))
      val emb = table(s, d, "embeddings")
      val sem = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 7), k = k)
        .select(col("corpus_id").as("id"), col("rank").as("r_sem"))
      lex.join(sem, Seq("id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0)))
        .select(col("id").as("doc_id"), col("r_lex"), col("r_sem"),
          col("rrf"))
        .orderBy(desc("rrf"), col("doc_id")).limit(10)
    }),
    "sim1_knn_bruteforce" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),
    // EMBEDDING CENTROID DRIFT (sim13): per-label cosine between the
    // reference embedding's centroid and the re-embedded corpus's —
    // the monitor every vector pipeline runs after a MODEL change
    // (same documents, new encoder: did any class's region move?).
    // Cosine on per-coordinate SUM vectors (scale-invariant ⇒ no mean
    // division); dot/norms² exact DECIMAL(38,0) integers, one x87
    // double tree. Harness re-embeds the SAME corpus with a +5.0
    // shift on coordinate 0 of even labels (post-quantization: +5e6
    // q-units, which dominates the noise-centroid norm) — those
    // labels must flag; odd labels are bit-identical re-embeddings,
    // cos ≈ 1.0, quiet
    "sim13_centroid_drift" -> ((s, d) => {
      val base = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "c")))
        .withColumn("q0",
          expr("CAST(floor(CAST(c AS DOUBLE) * 1000000D) AS BIGINT)"))
      val rows = base.select(col("label"), lit(0).as("src"),
          col("pos"), col("q0").as("q"))
        .unionAll(base.select(col("label"), lit(1).as("src"),
          col("pos"),
          expr("q0 + CASE WHEN label % 2 = 0 AND pos = 0 " +
            "THEN 5000000 ELSE 0 END").as("q")))
      Similarity.centroidDrift(rows)
    }),
    // HARD-NEGATIVE MINING (sim12): per anchor, the top-k most-similar
    // vectors of a DIFFERENT label — the contrastive-training data op
    // (InfoNCE/triplet batches need negatives that are hard, not
    // random). The exclusion is anchor-dependent (c.label ≠ anchor's),
    // so it's a join condition, not sim10's static pre-filter; the
    // anchor row itself is excluded by its own label. sim1 plan shape:
    // corpus never shuffles, anchors broadcast, salted two-phase top-k
    "sim12_hard_negatives" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),
    // MEASURED ANN-quality report (sim11): per-query recall@5 and
    // similarity-mass ratio of a deterministic label-centroid IVF
    // (d12's clustering recipe as IVF cells, 2 probes) against the
    // sim1 brute-force ground truth — the certification artifact
    // sim2/sim7/sim8 can't hash-check (xxhash seeds); this leg is
    // engine-replayable so the WHOLE report is oracle-checked.
    // All outputs exact e4 integers. SimilaritySpec pins the
    // hash-seeded variants' measured recall through the same report.
    "sim11_ann_recall_report" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 20)
      Similarity.annRecallReport(
        Similarity.bruteForceTopK(emb, q, k = 5),
        Similarity.labelCentroidIvfTopK(emb, q, k = 5, probes = 2))
    }),
    // PERSISTED ANN INDEX LIFECYCLE (sim14): d15's store discipline
    // for vectors — centroids train ONCE on the half of the corpus
    // with even vec_id and persist; two batches (vec_id % 4 = 1, then
    // % 4 = 3) assign against the FROZEN quantizer read from disk and
    // append to the inverted lists; the final probe searches the
    // store as it exists on disk. The oracle recomputes the whole
    // lifecycle from the raw table (seed-trained centroids, full
    // grown corpus in cells), so a green row certifies the store's
    // CONTENTS — appends really landed, centroids really froze — not
    // just the probe code. AnnStoreSpec pins probe-after-grow.
    "sim14_index_lifecycle" -> ((s, d) => {
      import graft.sim.AnnIndexStore
      val emb = table(s, d, "embeddings")
      val root = SinkQueries.tmp(s"ann_store_${java.util.UUID
        .randomUUID().toString.take(8)}", d)
      AnnIndexStore.init(emb.filter(col("vec_id") % 2 === 0), root)
      AnnIndexStore.append(s, root, emb.filter(col("vec_id") % 4 === 1))
      AnnIndexStore.append(s, root, emb.filter(col("vec_id") % 4 === 3))
      AnnIndexStore.search(s, root, emb.filter(col("vec_id") < 20),
          k = 5, probes = 2)
        .orderBy("query_id", "rank")
    }),
    // FILTERED VECTOR SEARCH (sim10): top-k under a metadata predicate
    // — "nearest EVEN-LABEL neighbors" — the filtered-search mode every
    // vector store serves (tenant, language, date filters). This is
    // PRE-filtering: the predicate pushes into the corpus scan BEFORE
    // the broadcast cross join, so the candidate set shrinks at the
    // source — the production choice when the filter is selective
    // (post-filtering a fixed top-k underfills results; an IVF route
    // additionally intersects the filter with its probed cells).
    // Same 4dp-cosine + id tie-break contract as sim1
    "sim10_filtered_knn" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("label") % 2 === 0),
        emb.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),
    // MMR diversified re-ranking (sim9): greedy top-5 from each
    // query's 20-NN pool by lambda*rel - (1-lambda)*max-sim-to-
    // selected — the diversity pass between ANN candidates and the
    // final answer. Quadratic stage capped at poolK^2 per query;
    // oracle unrolls the identical 5 greedy rounds
    "sim9_mmr_rerank" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 20), k = 5)
    }),
    // retrieval-quality evaluation: recall@10 / MRR / nDCG@10 of the
    // deterministic cosine ranking against label-match relevance — the
    // eval harness any retrieval stack runs before shipping a ranker.
    // Every metric is exact cross-engine: recall and MRR are single
    // int/int divisions, DCG gains are round(1/log2(rank+1), 6)
    // summed in DECIMAL (absorbing the engines' log2 ulp), and IDCG
    // reuses the same rounded gain table over generate_series
    "ir1_retrieval_eval" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val top = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 25 === 7), k = 10)
      val lab = emb.select(col("vec_id").as("cid"),
        col("label").as("clabel"))
      val qlab = emb.select(col("vec_id").as("qid"),
        col("label").as("qlabel"))
      val nrel = qlab.filter(col("qid") % 25 === 7)
        .join(lab, col("cid") =!= col("qid") &&
          col("clabel") === col("qlabel"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
      val agg = top
        .join(qlab, col("query_id") === col("qid"))
        .join(lab, col("corpus_id") === col("cid"))
        .withColumn("rel",
          (col("clabel") === col("qlabel")).cast("int"))
        .withColumn("gain", when(col("rel") === 1,
          round(lit(1.0) / log2(col("rank") + 1), 6))
          .otherwise(lit(0.0)))
        .groupBy(col("query_id"))
        .agg(sum(col("rel")).cast("long").as("hits"),
          min(when(col("rel") === 1, col("rank"))).as("first_rel"),
          sum(col("gain").cast("decimal(18,6)")).as("dcg_d"))
      val pos = s.range(1, 11)
        .select(col("id").cast("int").as("pos"))
        .withColumn("g", round(lit(1.0) / log2(col("pos") + 1), 6)
          .cast("decimal(18,6)"))
      val idcg = nrel.crossJoin(pos)
        .filter(col("pos") <= least(lit(10), col("n_rel")))
        .groupBy(col("qid")).agg(sum(col("g")).as("idcg_d"))
        .select(col("qid").as("iqid"), col("idcg_d"))
      agg
        .join(nrel, col("query_id") === col("qid"))
        .join(idcg, col("query_id") === col("iqid"))
        .select(col("query_id"), col("n_rel"), col("hits"),
          (col("hits").cast("double") / col("n_rel").cast("double"))
            .as("recall_at_10"),
          when(col("first_rel").isNotNull,
            lit(1.0) / col("first_rel")).otherwise(lit(0.0)).as("mrr"),
          (col("dcg_d").cast("double") / col("idcg_d").cast("double"))
            .as("ndcg_at_10"))
        .orderBy("query_id")
    }),
    "sim2_knn_ivf" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), k = 5,
        probes = 3)
        .orderBy("query_id", "rank")
    }),
    // trained-centroid IVF (hash-seeded deterministic Lloyd rounds, top-p
    // centroid multi-probe): rows-only like sim2 — recall ≥ the
    // hyperplane variant at equal probes is asserted in SimilaritySpec
    "sim7_knn_ivf_trained" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTrainedTopK(emb, emb.filter(col("vec_id") < 20),
        k = 5, nlist = 16, probes = 3)
        .orderBy("query_id", "rank")
    }),
    // product quantization + ADC + exact re-rank (the billion-scale ANN
    // serving shape): rows-only like sim2/sim7 (hash-seeded Lloyd);
    // recall vs brute + exact re-rank scores asserted in SimilaritySpec
    "sim8_knn_pq" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 20),
        k = 5, dims = 64, m = 8, ksub = 16, rerank = 4)
        .orderBy("query_id", "rank")
    }),
    "sim3_cosine_neardup" -> ((s, d) =>
      Similarity.cosineNearDupPairs(table(s, d, "embeddings"),
        threshold = 0.4)
        .orderBy("id_a", "id_b")),
    // the 100 TB near-dup path: banded-LSH candidates + exact verify
    // (xxhash64 hyperplanes → rows-only check; recall vs brute force is
    // asserted in SimilaritySpec)
    "sim4_lsh_neardup" -> ((s, d) =>
      Similarity.cosineLshNearDupPairs(table(s, d, "embeddings"),
        threshold = 0.4)
        .orderBy("id_a", "id_b")),
    // ENGINE-PORTABLE banded hyperplane-LSH (sim4p): the sim4
    // algorithm under the md5-prefix hash family + exact integer
    // arithmetic — DuckDB replays signatures, bands, candidates, and
    // the cosine² verify exactly (the d17 pattern for vectors).
    // threshold 0.4 ⇒ t²e4 = 1600
    "sim4p_lsh_portable" -> ((s, d) =>
      graft.sim.PortableSim.portableLshPairs(table(s, d, "embeddings"),
        t2e4 = 1600)
        .orderBy("id_a", "id_b")),
    // ENGINE-PORTABLE hyperplane IVF (sim2p): sim2's bucket/probe
    // algorithm with portable planes and integer sign(c)·c² rank
    // scores — bucket assignment, Hamming-flip probe order, and final
    // top-k replay exactly in DuckDB
    "sim2p_ivf_portable" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      graft.sim.PortableSim.portableIvfTopK(emb,
        emb.filter(col("vec_id") < 20), k = 5, bits = 4, probes = 3)
        .orderBy("query_id", "rank")
    }),
    // ENGINE-PORTABLE PQ (sim8p): sim8's serving shape in the original
    // Jégou L2 metric over shifted non-negative integers — subvector
    // Lloyd codebooks, codes, per-query ADC tables, Σ-lookup ranking,
    // exact integer-L2 re-rank; DuckDB replays training included
    "sim8p_pq_portable" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      graft.sim.PortableSim.portablePqTopK(emb,
        emb.filter(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    }),
    // ENGINE-PORTABLE trained IVF (sim7p): sim7's hash-seeded Lloyd
    // training made engine-exact (integer member-SUM centroids, md5
    // seeding, rational cross-multiplied assignment scores) — DuckDB
    // replays the TRAINING itself, then buckets, probe order, ranks
    "sim7p_ivf_trained_portable" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      graft.sim.PortableSim.portableIvfTrainedTopK(emb,
        emb.filter(col("vec_id") < 20), k = 5, nlist = 8, iters = 2,
        probes = 3)
        .orderBy("query_id", "rank")
    }),
    // int8 scalar quantization (embedding compression for ANN at scale);
    // the int8 array is CSV-joined because the harness compare hashes
    // scalar cells, not lists (same convention as a1's parallel arrays)
    "sim6_l2_normalize" -> ((s, d) =>
      Similarity.l2Normalize(table(s, d, "embeddings"), "embedding")
        .select(col("vec_id"), round(col("norm"), 6).as("norm"),
          array_join(transform(col("unit"),
            x => format_string("%.6f", x)), ",").as("unit"))
        .orderBy("vec_id")),
    "sim5_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(table(s, d, "embeddings"), "embedding")
        .select(col("vec_id"), round(col("max_abs"), 6).as("max_abs"),
          array_join(col("q").cast("array<string>"), ",").as("q"))
        .orderBy("vec_id"))
  )

  val oracle: Map[String, String] = Map(
    "rrf1_hybrid_search" -> {
      val lexSql = graft.text.TextAnalysis.bm25TopKSql(
        TextQueries.bm25Query, 50)
      val semSql = Similarity.bruteForceTopKSql(50, "vec_id = 7")
      s"""WITH lex AS (SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |      AS INT) AS r_lex
         |  FROM ($lexSql)),
         |sem AS (SELECT corpus_id AS id, rank AS r_sem FROM ($semSql))
         |SELECT coalesce(l.id, s.id) AS doc_id, r_lex, r_sem,
         |  coalesce(CAST('1' AS DOUBLE) / (60 + r_lex),
         |    CAST('0' AS DOUBLE))
         |  + coalesce(CAST('1' AS DOUBLE) / (60 + r_sem),
         |    CAST('0' AS DOUBLE)) AS rrf
         |FROM lex l FULL OUTER JOIN sem s ON l.id = s.id
         |ORDER BY rrf DESC, doc_id LIMIT 10"""
        .stripMargin.replace('\n', ' ')
    },
    "sim1_knn_bruteforce" ->
      Similarity.bruteForceTopKSql(5, "vec_id < 20"),
    "sim13_centroid_drift" -> Similarity.centroidDriftSql(
      """(WITH base AS (SELECT label, CAST(u.i - 1 AS INT) AS pos,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) *
        |      CAST('1000000' AS DOUBLE)) AS BIGINT) AS q0
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i))
        |SELECT label, 0 AS src, pos, q0 AS q FROM base
        |UNION ALL SELECT label, 1 AS src, pos,
        |  q0 + CASE WHEN label % 2 = 0 AND pos = 0
        |    THEN 5000000 ELSE 0 END AS q FROM base)"""
        .stripMargin.replace('\n', ' ')),
    "sim12_hard_negatives" ->
      Similarity.hardNegativesSql(5, "vec_id < 20"),
    // sim1's brute-force CTE as ground truth, the deterministic
    // label-centroid IVF as the ANN leg, and the exact-integer
    // report CTEs — the full chain hash-checks
    "sim11_ann_recall_report" ->
      s"""WITH tq AS (SELECT vec_id AS query_id,
         |    CAST(embedding AS DOUBLE[]) AS qvec
         |  FROM embeddings WHERE vec_id < 20),
         |t_scored AS (SELECT tq.query_id, e.vec_id AS corpus_id,
         |    round(list_cosine_similarity(
         |      CAST(e.embedding AS DOUBLE[]), tq.qvec), 4) AS sim
         |  FROM embeddings e, tq WHERE e.vec_id <> tq.query_id),
         |truth AS (SELECT query_id, rank, corpus_id, sim FROM (
         |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, corpus_id) AS INT) AS rank
         |    FROM t_scored) WHERE rank <= 5),
         |${Similarity.labelCentroidIvfTopKSql(5, 2, "vec_id < 20")},
         |${Similarity.annRecallReportSql("truth", "ann")}
         |SELECT * FROM rep ORDER BY query_id"""
        .stripMargin.replace('\n', ' '),
    // the full lifecycle replayed from the raw table: centroids from
    // the even-id seed only, cells over the whole corpus (what the
    // grown store must contain), the same 2-probe top-5
    "sim14_index_lifecycle" ->
      s"""WITH ${Similarity.labelCentroidIvfTopKSql(5, 2,
           "vec_id < 20", seedPred = "vec_id % 2 = 0")}
         |SELECT query_id, rank, corpus_id, sim FROM ann
         |ORDER BY query_id, rank""".stripMargin.replace('\n', ' '),
    // same pre-filtered candidate side
    "sim10_filtered_knn" ->
      Similarity.bruteForceTopKSql(5, "vec_id < 20",
        corpusPred = "label % 2 = 0"),
    "sim9_mmr_rerank" ->
      Similarity.mmrRerankSql("vec_id < 20", k = 5),
    "ir1_retrieval_eval" -> {
      val topSql = Similarity.bruteForceTopKSql(10, "vec_id % 25 = 7")
      s"""WITH top AS ($topSql),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |marked AS (SELECT t.query_id, t.rank,
         |    CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS rel
         |  FROM top t
         |  JOIN lab ql ON ql.vec_id = t.query_id
         |  JOIN lab cl ON cl.vec_id = t.corpus_id),
         |nrel AS (SELECT q.vec_id AS query_id, count(*) AS n_rel
         |  FROM embeddings q JOIN embeddings c
         |    ON c.vec_id <> q.vec_id AND c.label = q.label
         |  WHERE q.vec_id % 25 = 7 GROUP BY 1),
         |agg AS (SELECT query_id, CAST(sum(rel) AS BIGINT) AS hits,
         |    min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         |    sum(CAST(CASE WHEN rel = 1 THEN
         |        round(CAST('1' AS DOUBLE) / log2(rank + 1), 6)
         |      ELSE CAST('0' AS DOUBLE) END AS DECIMAL(18,6))) AS dcg_d
         |  FROM marked GROUP BY 1),
         |pos AS (SELECT CAST(x AS INT) AS pos,
         |    CAST(round(CAST('1' AS DOUBLE) / log2(x + 1), 6)
         |      AS DECIMAL(18,6)) AS g
         |  FROM generate_series(1, 10) t(x)),
         |idcg AS (SELECT n.query_id, sum(p.g) AS idcg_d
         |  FROM nrel n JOIN pos p ON p.pos <= least(10, n.n_rel)
         |  GROUP BY 1)
         |SELECT a.query_id, n.n_rel, a.hits,
         |  CAST(a.hits AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
         |    AS recall_at_10,
         |  coalesce(CAST('1' AS DOUBLE) / a.first_rel,
         |    CAST('0' AS DOUBLE)) AS mrr,
         |  CAST(a.dcg_d AS DOUBLE) / CAST(i.idcg_d AS DOUBLE)
         |    AS ndcg_at_10
         |FROM agg a
         |JOIN nrel n ON n.query_id = a.query_id
         |JOIN idcg i ON i.query_id = a.query_id
         |ORDER BY a.query_id""".stripMargin.replace('\n', ' ')
    },
    "sim3_cosine_neardup" -> Similarity.cosineNearDupPairsSql(0.4),
    "sim4p_lsh_portable" ->
      graft.sim.PortableSim.portableLshPairsSql("embeddings",
        t2e4 = 1600),
    "sim2p_ivf_portable" ->
      graft.sim.PortableSim.portableIvfTopKSql("embeddings",
        "id < 20", k = 5, bits = 4, probes = 3),
    "sim7p_ivf_trained_portable" ->
      graft.sim.PortableSim.portableIvfTrainedTopKSql("embeddings",
        "dd.id < 20", k = 5, nlist = 8, iters = 2, probes = 3),
    "sim8p_pq_portable" ->
      graft.sim.PortableSim.portablePqTopKSql("embeddings",
        "id < 20", k = 5),
    "sim5_quantize_int8" -> Similarity.quantizeInt8Sql,
    "sim6_l2_normalize" -> Similarity.l2NormalizeSql
  )
}
