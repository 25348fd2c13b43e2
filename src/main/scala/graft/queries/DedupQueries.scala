package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.graph.ConnectedComponents
import graft.queries.PipelineQueries.table
import graft.text.TextAnalysis

/** Registry + oracles for deduplication over `documents` (and, for the
  * semantic variant, `embeddings`).
  *
  * d1/d3 have exact DuckDB twins. d2 (MinHash+LSH) and d4 (SimHash) depend
  * on xxhash64, which DuckDB cannot reproduce → rows-only harness check;
  * their algorithmic correctness is asserted in ScalaTest with planted
  * near-duplicates (DedupSpec). d11 — although its candidate generation is
  * the same xxhash LSH — IS oracle-checked: its twin computes ground-truth
  * all-pairs Jaccard over the slice, so green certifies total band-probe
  * recall on this corpus, not just matching arithmetic. d12 (semantic) is
  * fully oracle-checked — clustering, prune, components, keeper pick.
  *
  * The testdata has no verbatim duplicates, so d1 plants them: the corpus
  * unioned with an id-shifted copy of itself — every text then has exactly
  * one duplicate and the operator must pick the min-id canonical. */
object DedupQueries {

  /** documents ∪ id-shifted copy (planted exact duplicates). */
  private def doubled(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 100000))
  }

  private val doubledSql =
    """(SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents)"""
      .stripMargin.replace('\n', ' ')

  /** documents ∪ frankendocs (docA + unique filler token + docB for every
    * 5th doc) — planted partial overlaps for span-level dedup. */
  private def spanCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
    val frank = docs
      .join(docs.select(col("doc_id").as("bid"), col("text").as("btext")),
        col("doc_id") + 1 === col("bid"))
      .filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" xq"), col("doc_id").cast("string"),
          lit("x "), col("btext")).as("text"))
    docs.unionAll(frank)
  }

  private val spanCorpusSql =
    """(SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT a.doc_id + 200000,
      |    a.text || ' xq' || CAST(a.doc_id AS VARCHAR) || 'x ' || b.text
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 5 = 0)""".stripMargin.replace('\n', ' ')

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> ((s, d) =>
      Dedup.exactGroups(doubled(s, d))
        .select(col("fingerprint"), col("n_copies"), col("canonical_id"),
          array_join(col("member_ids"), ",").as("member_ids"))
        .orderBy("canonical_id")),
    "d1_drop_duplicates" -> ((s, d) =>
      Dedup.dropExactDuplicates(doubled(s, d))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),
    "d2_minhash_lsh_pairs" -> ((s, d) => {
      // LSH candidates → exact-Jaccard verification ≥ 0.7 on shingles
      val docs = table(s, d, "documents").filter(col("doc_id") < 200)
      val sigs = Dedup.minhashSignatures(docs)
      val cands = Dedup.lshCandidatePairs(sigs)
      val sh = docs
        .select(col("doc_id"), TextAnalysis.normalized(col("text"))
          .as("norm"))
        .select(col("doc_id"), Dedup.shinglesFromNorm(col("norm")).as("sh"))
      cands
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("uni",
          size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
        // exact half-away 4-dp integer ratio (round-8 q-discipline)
        .withColumn("jaccard_e4",
          expr("(2 * inter * 10000 + uni) div (2 * uni)"))
        .filter(col("jaccard_e4") >= 7000L)
        .select("id_a", "id_b", "jaccard_e4")
        .orderBy("id_a", "id_b")
    }),
    // ASYMMETRIC containment pairs (d14): |A∩B|/|A| over 3-gram sets
    // — catches the excerpt-inside-document duplication Jaccard
    // structurally misses (|B| ≫ |A| caps Jaccard at |A|/|B|).
    // Planted 8-token excerpts of every 7th doc must flag against
    // their sources with containment ≈ 1 in the DIRECTED sense only.
    "d14_containment_pairs" -> ((s, d) => {
      val base = table(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id").as("id"), col("text"))
      val excerpts = table(s, d, "documents")
        .filter(col("doc_id") < 200 && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 900000).as("id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ")
            .as("text"))
      Dedup.ngramContainmentPairs(base.unionAll(excerpts), "id", "text")
        .orderBy("id_a", "id_b")
    }),
    "d3_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        table(s, d, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text")),
        threshold = 0.98)
        .orderBy("id_a", "id_b")),
    "d4_simhash_pairs" -> ((s, d) => {
      val docs = table(s, d, "documents").filter(col("doc_id") < 200)
      Dedup.simhashNearPairs(Dedup.simhash(docs), maxDist = 3)
        .orderBy("id_a", "id_b")
    }),
    // ENGINE-PORTABLE SimHash (d4p): the d4 algorithm with 48-bit
    // md5-prefix token hashes — DuckDB replays bit sums, signatures,
    // pigeonhole buckets, and every near-pair exactly (the d17
    // pattern applied to SimHash). d4 (xxhash64/64-bit) remains the
    // production path
    "d4p_simhash_portable" -> ((s, d) => {
      val docs = table(s, d, "documents").filter(col("doc_id") < 200)
      Dedup.simhashNearPairs(Dedup.portableSimhash(docs), maxDist = 3,
          sigBits = 48)
        .orderBy("id_a", "id_b")
    }),
    // near-dup pairs → clusters: connected components by min-label
    // propagation (one canonical doc per component)
    "d5_dedup_clusters" -> ((s, d) =>
      ConnectedComponents.run(
        Dedup.ngramJaccardPairs(
          table(s, d, "documents").filter(col("doc_id") < 200)
            .select(col("doc_id"), col("text")),
          threshold = 0.98).select("id_a", "id_b"))
        .orderBy("node")),
    // quality-aware canonical selection: within each near-dup cluster
    // keep the BEST member (longest text, min-id tie-break) — the
    // curation refinement over d6's min-id rule; one partial-
    // aggregatable min_by per cluster, no window over the corpus
    "d9_canonical_selection" -> ((s, d) => {
      val docs = table(s, d, "documents").filter(col("doc_id") < 200)
      val comp = ConnectedComponents.run(
        Dedup.ngramJaccardPairs(docs.select(col("doc_id"), col("text")),
          threshold = 0.98).select("id_a", "id_b"))
      comp.join(docs, col("node") === col("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          min_by(struct(col("doc_id"), col("n_chars")),
            struct((-col("n_chars")).as("neg"), col("doc_id"))).as("c"))
        .select(col("component"), col("c.doc_id").as("canonical_id"),
          col("c.n_chars").as("canonical_n_chars"), col("n_members"))
        .orderBy("component")
    }),
    // the full dedup pipeline: pairs → clusters → corpus minus
    // non-canonical cluster members
    "d6_drop_near_duplicates" -> ((s, d) => {
      val docs = table(s, d, "documents").filter(col("doc_id") < 200)
      Dedup.dropNearDuplicates(docs,
        Dedup.ngramJaccardPairs(docs.select(col("doc_id"), col("text")),
          threshold = 0.98))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // benchmark decontamination: docs 0-19 play the eval set; any corpus
    // doc sharing a 5-gram with them is dropped (test-set leakage guard)
    "d7_decontaminate" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Dedup.decontaminate(
        corpus = docs.filter(col("doc_id") >= 20),
        benchmark = docs.filter(col("doc_id") < 20))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // span-level substring dedup over a corpus with planted PARTIAL
    // overlaps: every 5th doc spawns a frankendoc = docA ++ unique filler
    // ++ docB, so originals become fully-covered and frankendocs carry
    // exactly two merged spans separated by the uncovered filler token
    "d8_duplicate_spans" -> ((s, d) =>
      Dedup.duplicateSpans(spanCorpus(s, d), k = 8)
        .orderBy("doc_id")),
    // exact-substring EXCISION (d16): the transform half of Lee et al.
    // 2022 that d8 only measures — duplicated 8-token windows are CUT
    // corpus-wide except their canonical (min doc_id, pos) occurrence.
    // On the same planted corpus the originals are canonical and come
    // through intact while every frankendoc collapses to its unique
    // xq<id>x filler — readable keep-one semantics the oracle replays
    // token for token
    "d16_substring_excise" -> ((s, d) =>
      Dedup.exciseDuplicateSpans(spanCorpus(s, d), k = 8)
        .orderBy("doc_id")),
    // ENGINE-PORTABLE MinHash-LSH (d17): the d2 algorithm under the
    // md5-prefix hash family, so the oracle replays the signatures —
    // and therefore the banding and every candidate pair — exactly.
    // Planted exact re-deliveries must agree on all 16 minhashes
    // (4 bands); suffix-mutated twins on most. d2 (xxhash64) stays
    // the 100 TB path; this row gives the ALGORITHM oracle evidence
    "d17_minhash_portable" -> ((s, d) => {
      val base = table(s, d, "documents")
        .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
      val planted = base
        .unionAll(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" zq"),
              col("doc_id").cast("string"), lit("x")).as("text")))
        .unionAll(base.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 600000).as("doc_id"), col("text")))
      Dedup.portableMinhashPairs(planted)
    }),
    // cross-batch incremental dedup: even docs play the already-ingested
    // corpus, the incoming batch is the odd docs plus planted cross-batch
    // re-deliveries (every 10th even doc re-arrives under a new id) and
    // within-batch duplicates (every doc_id%10==1 arrives twice) — the
    // first must die against the corpus fingerprint index, the second
    // against the batch's own min-id collapse
    "d10_incremental_dedup" -> ((s, d) => {
      val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionAll(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 300000))
        .unionAll(docs.filter(col("doc_id") % 10 === 1)
          .withColumn("doc_id", col("doc_id") + 400000))
      Dedup.incrementalDedup(corpus, incoming).orderBy("doc_id")
    }),
    // cross-batch NEAR-dup dedup: the d10 scenario again, but the
    // planted re-deliveries are MUTATED — every 10th doc of the sliced
    // corpus re-arrives with an appended unique token (shingle Jaccard
    // ≈ 0.95, exact fingerprint DIFFERENT, so d10 would accept it) and
    // every 20th verbatim (near-dup must subsume exact). The slice
    // (doc_id < 600) bounds the oracle's all-pairs ground truth at any
    // SF; the engine side runs the LSH band-index probe + exact-Jaccard
    // verify, so a green row also certifies total LSH recall here
    "d11_incremental_neardup" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 600)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionAll(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" zq"),
              col("doc_id").cast("string"), lit("x")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 20 === 0)
          .withColumn("doc_id", col("doc_id") + 400000))
      Dedup.incrementalNearDedup(corpus, incoming).orderBy("doc_id")
    }),
    // PERSISTED index LIFECYCLE (d15): the io12 ledger pattern applied
    // to d11's LSH band index — init from a seed corpus, then two
    // ingest runs where each batch probes the index READ FROM DISK and
    // its survivors update the store the next batch probes. Batch 2
    // plants mutated re-deliveries of batch 1's OWN survivors: those
    // reject only if run 1 actually turned the index over (a per-call
    // rebuild can't distinguish a stale index). Exact-verify compares
    // 10000·|∩| ≥ 7000·|∪| in pure integers; oracle = ground-truth
    // all-pairs Jaccard replayed sequentially over both stages, so
    // green also certifies total band-probe recall per stage.
    "d15_index_lifecycle" -> ((s, d) => d15Lifecycle(s, d, cap = 500L)),

    // signature-only cross-batch near-dedup (d13): the d11 scenario
    // verified by ESTIMATED Jaccard from the stored minhash signatures
    // — corpus text never re-read after index build. xxhash-derived
    // output → rows-only harness check (like d2/d4); recall and the
    // d10/d11/d13 relationship are pinned in DedupSpec
    "d13_neardup_signature" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 600)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .unionAll(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" zq"),
              col("doc_id").cast("string"), lit("x")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 20 === 0)
          .withColumn("doc_id", col("doc_id") + 400000))
      Dedup.incrementalNearDedupBySignature(corpus, incoming)
        .orderBy("doc_id")
    }),
    // SEMANTIC dedup (SemDeDup-style, d12): embedding-space near-dups
    // pruned within clusters only. The corpus plants perturbed copies
    // (every 7th vector re-arrives with dim0 bumped by +0.3 — cosine vs
    // its original ≈ 0.97+, far above every natural pair's ≤ 0.56) so
    // the within-cluster prune has real work; the kept representative
    // per duplicate set is the member LEAST similar to its centroid,
    // min-id tie-break. Clusters are the x10 nearest-label-centroid
    // assignment — deterministic and oracle-expressible
    "d12_semantic_dedup" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val base = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      val planted = base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          concat(array(element_at(col("vec"), 1) + 0.3),
            slice(col("vec"), 2, 63)).as("vec"))
      val corpus = base.unionAll(planted)
      val centroids = emb
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("dim_avg"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
          x => x.getField("dim_avg")).as("centroid"))
      graft.dedup.SemDedup.semanticDedup(corpus, centroids)
        .orderBy("vec_id")
    })
  )

  private def d15Lifecycle(s: SparkSession, d: String,
      cap: Long): DataFrame = {
      import graft.dedup.NearDupIndexStore
      val root = SinkQueries.tmp(s"neardup_store_${java.util.UUID
        .randomUUID().toString.take(8)}", d)
      val base = table(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < cap)
      val seed = base.filter(col("doc_id") < cap * 2 / 5)
      val fresh1 = base.filter(col("doc_id") >= cap * 2 / 5 &&
        col("doc_id") < cap * 7 / 10)
      def mut(df: DataFrame, shift: Long, tag: String) = df
        .select((col("doc_id") + shift).as("doc_id"),
          concat(col("text"), lit(s" $tag"),
            col("doc_id").cast("string"), lit("x")).as("text"))
      val batch1 = fresh1
        .unionAll(mut(seed.filter(col("doc_id") % 10 === 0),
          300000L, "zq"))
        .unionAll(seed.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 400000).as("doc_id"), col("text")))
      val batch2 = base.filter(col("doc_id") >= cap * 7 / 10)
        .unionAll(mut(fresh1.filter(col("doc_id") % 10 === 0),
          500000L, "zr"))
        .unionAll(mut(seed.filter(col("doc_id") % 15 === 0),
          600000L, "zs"))
      NearDupIndexStore.init(seed, root)
      val s1 = NearDupIndexStore.ingest(s, root, batch1)
      val s2 = NearDupIndexStore.ingest(s, root, batch2)
      // the lifecycle proof: at least one mutated re-delivery of a
      // batch-1 survivor was rejected by the UPDATED index
      require(s2.filter(col("doc_id") >= 500000 &&
        col("doc_id") < 600000).count() <
        batch2.filter(col("doc_id") >= 500000 &&
          col("doc_id") < 600000).count(),
        "batch 2 must reject re-deliveries of batch 1 survivors")
      s1.select(lit(1L).as("batch"), col("doc_id"), col("fingerprint"))
        .unionAll(s2.select(lit(2L).as("batch"), col("doc_id"),
          col("fingerprint")))
        .orderBy("batch", "doc_id")
  }

  /** Bench-scoped workload overrides (see SparkEntry.benchOverrides):
    * d15 at 150 docs so the bench entry measures the PROBE path — read
    * index from disk, band-join the batch, update — rather than
    * repeatedly rebuilding a 500-doc store every pass. The scale is an
    * EXPLICIT parameter (round-10 ADVICE: no JVM-global flag keying
    * query semantics); Verify always runs the 500-doc lifecycle, and
    * the rejection require gates both scales. */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    Map("d15_index_lifecycle" -> ((s, d) => d15Lifecycle(s, d, 150L)))

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      s"""SELECT $fp AS fingerprint, count(*) AS n_copies,
         |  min(doc_id) AS canonical_id,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS member_ids
         |FROM $doubledSql
         |GROUP BY 1 HAVING count(*) > 1
         |ORDER BY canonical_id""".stripMargin.replace('\n', ' ')
    },
    "d1_drop_duplicates" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      s"""SELECT doc_id, lang, source, n_chars FROM (
         |  SELECT *, min(doc_id) OVER (PARTITION BY $fp) AS keep_id
         |  FROM (SELECT doc_id, text, lang, source, n_chars FROM documents
         |    UNION ALL SELECT doc_id + 100000, text, lang, source, n_chars
         |    FROM documents))
         |WHERE doc_id = keep_id
         |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
    },
    "d14_containment_pairs" ->
      (Dedup.ngramContainmentSql(
        """(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
          |UNION ALL
          |SELECT doc_id + 900000 AS id, array_to_string(
          |    (regexp_split_to_array(trim(regexp_replace(lower(text),
          |     '\s+', ' ', 'g')), '\s+'))[1:8], ' ') AS text
          |FROM documents WHERE doc_id < 200 AND doc_id % 7 = 0)"""
          .stripMargin.replace('\n', ' ')) + " ORDER BY id_a, id_b"),
    "d3_ngram_jaccard" ->
      (Dedup.ngramJaccardSql(
        "(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200)",
        0.98) + " ORDER BY id_a, id_b"),
    // transitive closure of the d3 pair graph; min reachable id per node
    "d5_dedup_clusters" -> {
      val pairs = Dedup.ngramJaccardSql(
        "(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200)",
        0.98)
      s"""WITH RECURSIVE pairs AS (SELECT * FROM ($pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, root) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)
         |SELECT node, min(root) AS component FROM reach
         |GROUP BY 1 ORDER BY node""".stripMargin.replace('\n', ' ')
    },
    "d9_canonical_selection" -> {
      val pairs = Dedup.ngramJaccardSql(
        "(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200)",
        0.98)
      s"""WITH RECURSIVE pairs AS (SELECT * FROM ($pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, root) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
         |comp AS (SELECT node, min(root) AS component FROM reach
         |  GROUP BY 1),
         |m AS (SELECT c.component, d.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY c.component
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.component) AS n_members
         |  FROM comp c JOIN documents d ON d.doc_id = c.node)
         |SELECT component, doc_id AS canonical_id,
         |  n_chars AS canonical_n_chars,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM m WHERE rn = 1 ORDER BY component"""
        .stripMargin.replace('\n', ' ')
    },
    "d6_drop_near_duplicates" -> {
      val pairs = Dedup.ngramJaccardSql(
        "(SELECT doc_id AS id, text FROM documents WHERE doc_id < 200)",
        0.98)
      s"""WITH RECURSIVE pairs AS (SELECT * FROM ($pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, root) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
         |comp AS (SELECT node, min(root) AS component FROM reach GROUP BY 1)
         |SELECT doc_id, lang, source, n_chars
         |FROM documents WHERE doc_id < 200
         |  AND doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
         |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
    },
    "d7_decontaminate" -> {
      val kept = Dedup.decontaminateSql(
        "(SELECT doc_id, text, lang, source, n_chars FROM documents " +
          "WHERE doc_id >= 20)",
        "(SELECT doc_id, text FROM documents WHERE doc_id < 20)")
      s"SELECT doc_id, lang, source, n_chars FROM ($kept) ORDER BY doc_id"
    },
    "d8_duplicate_spans" -> {
      val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
      s"""WITH corpus AS (SELECT * FROM $spanCorpusSql),
         |sized AS (SELECT doc_id, $toks AS toks,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM corpus WHERE len($toks) >= 8),
         |sh AS (SELECT doc_id, n_tokens,
         |    unnest(generate_series(1, CAST(n_tokens AS INT) - 7)) AS pos,
         |    unnest(list_transform(
         |      generate_series(1, CAST(n_tokens AS INT) - 7),
         |      i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))))
         |      AS h
         |  FROM sized),
         |dup AS (SELECT h FROM sh GROUP BY 1 HAVING count(*) > 1),
         |occ AS (SELECT doc_id, n_tokens, pos FROM sh
         |  WHERE h IN (SELECT h FROM dup)),
         |isl AS (SELECT doc_id, n_tokens, pos,
         |    max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM occ),
         |gid AS (SELECT doc_id, n_tokens, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
         |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS island
         |  FROM isl),
         |sp AS (SELECT doc_id, n_tokens, island, min(pos) AS s,
         |    max(pos + 7) AS e
         |  FROM gid GROUP BY 1, 2, 3)
         |SELECT doc_id, n_tokens, count(*) AS n_dup_spans,
         |  CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
         |  CAST(sum(e - s + 1) AS DOUBLE) / n_tokens AS dup_fraction
         |FROM sp GROUP BY doc_id, n_tokens
         |ORDER BY doc_id""".stripMargin.replace('\n', ' ')
    },
    "d16_substring_excise" ->
      Dedup.exciseDuplicateSpansSql(spanCorpusSql, k = 8),
    "d4p_simhash_portable" -> Dedup.portableSimhashPairsSql(
      "(SELECT doc_id, text FROM documents WHERE doc_id < 200)",
      maxDist = 3),
    "d17_minhash_portable" -> Dedup.portableMinhashPairsSql(
      """(SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 500000,
        |      text || ' zq' || CAST(doc_id AS VARCHAR) || 'x'
        |    FROM documents WHERE doc_id < 200 AND doc_id % 7 = 0
        |  UNION ALL SELECT doc_id + 600000, text FROM documents
        |    WHERE doc_id < 200 AND doc_id % 11 = 0)"""
        .stripMargin.replace('\n', ' ')),
    // ground-truth all-pairs shingle Jaccard over the sliced
    // batch×corpus — NO LSH oracle-side, so a green row certifies both
    // the verify arithmetic AND the band probe's recall (see the d11
    // registry comment); same min-id collapse as d10 on the survivors
    "d11_incremental_neardup" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      val norm = TextAnalysis.normalizedSql("text")
      val sh = s"list_distinct([substr(n, i, 5) " +
        "for i in range(1, greatest(len(n) - 4, 1) + 1)])"
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 600),
         |corpus AS (SELECT * FROM base WHERE doc_id % 2 = 0),
         |incoming AS (
         |  SELECT doc_id, text FROM base WHERE doc_id % 2 = 1
         |  UNION ALL SELECT doc_id + 300000,
         |    text || ' zq' || CAST(doc_id AS VARCHAR) || 'x'
         |    FROM base WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 400000, text FROM base
         |    WHERE doc_id % 20 = 0),
         |csh AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM corpus)),
         |ish AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM incoming)),
         |rej AS (SELECT DISTINCT i.doc_id FROM ish i JOIN csh c
         |  ON CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
         |     / CAST(len(list_distinct(i.s || c.s)) AS DOUBLE) >= 0.7),
         |fresh AS (SELECT doc_id, $fp AS fingerprint FROM incoming
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rej))
         |SELECT min(doc_id) AS doc_id, fingerprint
         |FROM fresh GROUP BY fingerprint ORDER BY doc_id"""
        .stripMargin.replace('\n', ' ')
    },
    // ground-truth sequential replay of the two-stage lifecycle:
    // stage-1 all-pairs Jaccard vs the seed, survivor collapse keeps
    // the min-id row's TEXT, stage 2 verifies against seed ∪ stage-1
    // survivors — integer 10000·|∩| ≥ 7000·|∪| compare throughout
    "d15_index_lifecycle" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      val norm = TextAnalysis.normalizedSql("text")
      val sh = s"list_distinct([substr(n, i, 5) " +
        "for i in range(1, greatest(len(n) - 4, 1) + 1)])"
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 500),
         |seed AS (SELECT * FROM base WHERE doc_id < 200),
         |fresh1 AS (SELECT * FROM base
         |  WHERE doc_id >= 200 AND doc_id < 350),
         |batch1 AS (
         |  SELECT * FROM fresh1
         |  UNION ALL SELECT doc_id + 300000,
         |    text || ' zq' || CAST(doc_id AS VARCHAR) || 'x'
         |  FROM seed WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 400000, text
         |  FROM seed WHERE doc_id % 20 = 0),
         |batch2 AS (
         |  SELECT * FROM base WHERE doc_id >= 350
         |  UNION ALL SELECT doc_id + 500000,
         |    text || ' zr' || CAST(doc_id AS VARCHAR) || 'x'
         |  FROM fresh1 WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 600000,
         |    text || ' zs' || CAST(doc_id AS VARCHAR) || 'x'
         |  FROM seed WHERE doc_id % 15 = 0),
         |csh0 AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM seed)),
         |ish1 AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM batch1)),
         |rej1 AS (SELECT DISTINCT i.doc_id FROM ish1 i JOIN csh0 c
         |  ON len(list_intersect(i.s, c.s)) * 10000
         |     >= len(list_distinct(i.s || c.s)) * 7000),
         |surv1 AS (SELECT doc_id, text, fingerprint FROM (
         |    SELECT doc_id, text, $fp AS fingerprint,
         |      row_number() OVER (PARTITION BY $fp ORDER BY doc_id)
         |        AS rn
         |    FROM batch1
         |    WHERE doc_id NOT IN (SELECT doc_id FROM rej1))
         |  WHERE rn = 1),
         |csh1 AS (SELECT doc_id, s FROM csh0
         |  UNION ALL SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM surv1)),
         |ish2 AS (SELECT doc_id, $sh AS s FROM
         |  (SELECT doc_id, $norm AS n FROM batch2)),
         |rej2 AS (SELECT DISTINCT i.doc_id FROM ish2 i JOIN csh1 c
         |  ON len(list_intersect(i.s, c.s)) * 10000
         |     >= len(list_distinct(i.s || c.s)) * 7000),
         |surv2 AS (SELECT doc_id, text, fingerprint FROM (
         |    SELECT doc_id, text, $fp AS fingerprint,
         |      row_number() OVER (PARTITION BY $fp ORDER BY doc_id)
         |        AS rn
         |    FROM batch2
         |    WHERE doc_id NOT IN (SELECT doc_id FROM rej2))
         |  WHERE rn = 1)
         |SELECT CAST(1 AS BIGINT) AS batch, doc_id, fingerprint
         |FROM surv1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), doc_id, fingerprint FROM surv2
         |ORDER BY batch, doc_id""".stripMargin.replace('\n', ' ')
    },
    // same clustering (x10's oracle shape), same within-cluster pair
    // predicate, d5's recursive-CTE components, and the least-centroid-
    // sim keeper pick as a row_number over (csim, node)
    "d12_semantic_dedup" ->
      """WITH RECURSIVE base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |corpus AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |    [vec[1] + CAST('0.3' AS DOUBLE)] || vec[2:]
        |  FROM base WHERE vec_id % 7 = 0),
        |exploded AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6)
        |    AS dim_avg
        |  FROM exploded GROUP BY 1, 2),
        |cents AS (
        |  SELECT label, list(dim_avg ORDER BY pos) AS centroid
        |  FROM dims GROUP BY label),
        |scored AS (
        |  SELECT c.vec_id, ce.label,
        |    round(list_cosine_similarity(c.vec, ce.centroid), 4) AS sim
        |  FROM corpus c, cents ce),
        |assigned AS (
        |  SELECT vec_id, label AS cluster, sim AS csim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, label) AS rnk FROM scored)
        |  WHERE rnk = 1),
        |members AS (SELECT a.vec_id, a.cluster, a.csim, c.vec
        |  FROM assigned a JOIN corpus c USING (vec_id)),
        |pairs AS (
        |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM members x JOIN members y
        |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  WHERE round(list_cosine_similarity(x.vec, y.vec), 4) >= 0.95),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, root) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
        |comp AS (SELECT node, min(root) AS component FROM reach
        |  GROUP BY 1),
        |keepers AS (SELECT component, node AS keep_id FROM (
        |    SELECT c.component, c.node,
        |      row_number() OVER (PARTITION BY c.component
        |        ORDER BY a.csim, c.node) AS rn
        |    FROM comp c JOIN assigned a ON a.vec_id = c.node)
        |  WHERE rn = 1),
        |losers AS (SELECT node FROM comp JOIN keepers USING (component)
        |  WHERE node <> keep_id)
        |SELECT vec_id, cluster, csim FROM assigned
        |WHERE vec_id NOT IN (SELECT node FROM losers)
        |ORDER BY vec_id""".stripMargin.replace('\n', ' '),
    // same index/anti-join/min-id-collapse construction; NOT IN is safe
    // here (fingerprints are never NULL)
    "d10_incremental_dedup" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         |incoming AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
         |  UNION ALL SELECT doc_id + 300000, text FROM documents
         |    WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 400000, text FROM documents
         |    WHERE doc_id % 10 = 1),
         |idx AS (SELECT DISTINCT $fp AS fingerprint FROM corpus),
         |inf AS (SELECT doc_id, $fp AS fingerprint FROM incoming),
         |fresh AS (SELECT * FROM inf
         |  WHERE fingerprint NOT IN (SELECT fingerprint FROM idx))
         |SELECT min(doc_id) AS doc_id, fingerprint
         |FROM fresh GROUP BY fingerprint ORDER BY doc_id"""
        .stripMargin.replace('\n', ' ')
    }
  )
}
