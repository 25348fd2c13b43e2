package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{eventsTs, eventsUs, gold, table, withPipeline}
import graft.queries.ExtendedQueries.sessionize
import graft.text.TextAnalysis

/** Entity-resolution family: fuzzy/phonetic matching, blocking
  * quality, Fellegi–Sunter, golden records, threshold sweeps,
  * identity-graph clustering.
  *
  * Mechanically split out of ExtendedQueries (round 8, VERDICT ask #8)
  * — query keys and bodies unchanged; [[ExtendedQueries]] aggregates
  * the family maps so the driver contract is untouched. */
object EntityResolutionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // entity resolution: a deterministically perturbed 10% of customer
    // names (swap/delete/replace in the last two id chars) re-matched
    // to the clean table. THE scale lever is the blocking key: a 5-char
    // stable key bounds candidates to ~|dirty|·10 pairs (a 3-char key
    // left 1M+ pairs and 8 s at sf0.1 — real pipelines union several
    // such keys for recall); the codegen'd graft_jaro_winkler scores
    // candidates inside the join's WholeStageCodegen span, best match
    // via min_by((-jw, key)) with no window over the candidates
    // BLOCKING-QUALITY metrics (er5): pair completeness vs reduction
    // ratio for three candidate blocking keys over er1's planted
    // dirty records — the report that decides which blocking ships.
    // Candidate counts come from (key -> count) products, never
    // materialized pairs; the tail key overlaps the planted
    // mutations, so its completeness measurably drops below 1
    "er5_blocking_quality" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("d_key"),
          expr("""CASE CAST(c_custkey % 3 AS INT)
            | WHEN 0 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18, 1), substring(c_name, 17, 1))
            | WHEN 1 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18))
            | ELSE concat(substring(c_name, 1, 17), 'X')
            |END""".stripMargin).as("dirty_name"))
      graft.er.BlockingMetrics.report(dirty, cust, Seq(
        ("key_mid5", substring(col("dirty_name"), 12, 5),
          substring(col("c_name"), 12, 5)),
        ("key_mid3", substring(col("dirty_name"), 12, 3),
          substring(col("c_name"), 12, 3)),
        ("key_tail3", substring(col("dirty_name"), 16, 3),
          substring(col("c_name"), 16, 3))))
        .orderBy("scheme")
    }),
    // MATCH-THRESHOLD SWEEP (er7): the er-family's operating-point
    // eval — at JW cutoffs 0.80..0.99, how many planted dirty records
    // resolve to their true source, match WRONG, or drop (no
    // candidate clears the bar). The key economy: the best candidate
    // is threshold-INDEPENDENT (filter-then-argmax ≡ argmax-then-
    // filter under jw-ordering), so the corpus contributes ONE
    // blocked+scored argmax and the sweep is a 5-row explode over the
    // per-dirty best table. JW quantizes to exact basis points
    // (CAST(round(jw·10000)) — the 4dp round makes the product
    // integer-valued) so threshold compares are integer-exact.
    "er7_threshold_sweep" -> ((s, d) => {
      import graft.expr.JaroWinkler
      val cust = table(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("d_key"),
          expr("""CASE CAST(c_custkey % 3 AS INT)
            | WHEN 0 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18, 1), substring(c_name, 17, 1))
            | WHEN 1 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18))
            | ELSE concat(substring(c_name, 1, 17), 'X')
            |END""".stripMargin).as("dirty_name"))
      val best = dirty
        .join(cust, substring(col("dirty_name"), 12, 5) ===
          substring(col("c_name"), 12, 5))
        .withColumn("jw_bp", expr(
          "CAST(round(graft_jaro_winkler(dirty_name, c_name) * 10000)" +
            " AS BIGINT)"))
        .groupBy(col("d_key"))
        .agg(min_by(struct(col("c_custkey"), col("jw_bp")),
          struct((-col("jw_bp")).as("nj"), col("c_custkey"))).as("b"))
        .select(col("d_key"), col("b.c_custkey").as("mk"),
          col("b.jw_bp").as("bp"))
      val nd = dirty.agg(count(lit(1)).as("n_dirty"))
      best
        .withColumn("threshold_bp", explode(array(
          lit(8000L), lit(8500L), lit(9000L), lit(9500L), lit(9900L))))
        .groupBy(col("threshold_bp"))
        .agg(
          sum(when(col("bp") >= col("threshold_bp") &&
            col("mk") === col("d_key"), 1L).otherwise(0L))
            .as("n_resolved"),
          sum(when(col("bp") >= col("threshold_bp") &&
            col("mk") =!= col("d_key"), 1L).otherwise(0L))
            .as("n_wrong"),
          sum(when(col("bp") < col("threshold_bp"), 1L).otherwise(0L))
            .as("n_dropped"))
        .crossJoin(broadcast(nd))
        .select(col("threshold_bp"), col("n_resolved"), col("n_wrong"),
          col("n_dropped"),
          expr("n_resolved * 10000 div n_dirty").as("recall_bp"))
        .orderBy("threshold_bp")
    }),
    // FELLEGI–SUNTER probabilistic record linkage (er6): the
    // principled multi-field scorer above er1-er3's single-field
    // matchers — per candidate pair, each field contributes ln(m/u) on
    // agreement and ln((1−m)/(1−u)) on disagreement; the u
    // probabilities (random-pair agreement odds) are ESTIMATED FROM
    // THE DATA as Σ(count_v²)/N² over each field's value distribution
    // (frequency-based u; fuzzy name field uses u = 1/N, m = 0.95
    // fixed — documented priors). The total is a FIXED 4-term
    // expression, so no aggregation-order discipline is needed; the
    // decision bands (match > 10 > possible > 0 > non-match) come from
    // the weight magnitudes. Same bounded blocking as er1; the u/
    // weight table is ONE metadata row crossed onto candidates.
    "er6_fellegi_sunter" -> ((s, d) => {
      import graft.expr.JaroWinkler
      val cust = table(s, d, "customer")
      def s2(c: org.apache.spark.sql.Column, out: String) = cust
        .groupBy(c.as("v")).agg(count(lit(1)).as("cc"))
        .agg(sum(col("cc") * col("cc")).as(out))
      def ua(s2c: org.apache.spark.sql.Column,
          nn: org.apache.spark.sql.Column) =
        s2c.cast("double") / (nn * nn)
      val m = lit(0.95)
      val md = lit(0.05)
      val wts = cust.agg(count(lit(1)).as("nn"))
        .crossJoin(s2(col("c_mktsegment"), "s_seg"))
        .crossJoin(s2(col("c_nationkey"), "s_nat"))
        .crossJoin(s2(expr("CAST(round(c_acctbal * 100) AS BIGINT) % 10000"),
          "s_ph"))
        .select(
          log(m / (lit(1.0) / col("nn"))).as("w_name_a"),
          log(md / (lit(1.0) - lit(1.0) / col("nn"))).as("w_name_d"),
          log(m / ua(col("s_seg"), col("nn"))).as("w_seg_a"),
          log(md / (lit(1.0) - ua(col("s_seg"), col("nn"))))
            .as("w_seg_d"),
          log(m / ua(col("s_nat"), col("nn"))).as("w_nat_a"),
          log(md / (lit(1.0) - ua(col("s_nat"), col("nn"))))
            .as("w_nat_d"),
          log(m / ua(col("s_ph"), col("nn"))).as("w_ph_a"),
          log(md / (lit(1.0) - ua(col("s_ph"), col("nn"))))
            .as("w_ph_d"))
      val dirty = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("d_key"),
          expr("""CASE CAST(c_custkey % 3 AS INT)
            | WHEN 0 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18, 1), substring(c_name, 17, 1))
            | WHEN 1 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18))
            | ELSE concat(substring(c_name, 1, 17), 'X')
            |END""".stripMargin).as("d_name"),
          when(col("c_custkey") % 4 === 0, lit("MISMATCHED"))
            .otherwise(col("c_mktsegment")).as("d_seg"),
          col("c_nationkey").as("d_nat"),
          when(col("c_custkey") % 2 === 0, lit(-1L))
            .otherwise(expr(
              "CAST(round(c_acctbal * 100) AS BIGINT) % 10000"))
            .as("d_ph4"))
      val score =
        when(col("jw") >= 0.9, col("w_name_a")).otherwise(col("w_name_d")) +
        when(col("d_seg") === col("c_mktsegment"), col("w_seg_a"))
          .otherwise(col("w_seg_d")) +
        when(col("d_nat") === col("c_nationkey"), col("w_nat_a"))
          .otherwise(col("w_nat_d")) +
        when(col("d_ph4") === expr(
            "CAST(round(c_acctbal * 100) AS BIGINT) % 10000"),
          col("w_ph_a"))
          .otherwise(col("w_ph_d"))
      dirty
        .join(cust, substring(col("d_name"), 12, 5) ===
          substring(col("c_name"), 12, 5))
        .crossJoin(broadcast(wts))
        .withColumn("jw", round(JaroWinkler.jw(col("d_name"),
          col("c_name")), 4))
        .withColumn("score", round(score, 6))
        .groupBy(col("d_key"))
        .agg(min_by(struct(col("c_custkey"), col("score")),
          struct((-col("score")).as("ns"), col("c_custkey"))).as("b"))
        .select(col("d_key"), col("b.c_custkey").as("matched_key"),
          col("b.score").as("score"),
          when(col("b.score") > 10, "match")
            .when(col("b.score") > 0, "possible")
            .otherwise("non_match").as("decision"))
        .orderBy("d_key")
    }),
    "er1_fuzzy_match" -> ((s, d) => {
      import graft.expr.JaroWinkler
      val cust = table(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("d_key"),
          expr("""CASE CAST(c_custkey % 3 AS INT)
            | WHEN 0 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18, 1), substring(c_name, 17, 1))
            | WHEN 1 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18))
            | ELSE concat(substring(c_name, 1, 17), 'X')
            |END""".stripMargin).as("dirty_name"))
      dirty
        .join(cust,
          substring(col("dirty_name"), 12, 5) ===
            substring(col("c_name"), 12, 5))
        .withColumn("jw",
          round(JaroWinkler.jw(col("dirty_name"), col("c_name")), 4))
        .filter(col("jw") >= 0.9)
        .groupBy(col("d_key"), col("dirty_name"))
        .agg(min_by(
          struct(col("c_custkey"), col("c_name"), col("jw")),
          struct((-col("jw")).as("nj"), col("c_custkey"))).as("m"))
        .select(col("d_key"), col("dirty_name"),
          col("m.c_custkey").as("matched_key"),
          col("m.c_name").as("matched_name"), col("m.jw").as("jw"))
        .orderBy("d_key")
    }),
    // IDENTITY-GRAPH CLUSTERING (er8): the end-to-end ER pipeline the
    // er1–er7 family stops short of — blocking → per-record best
    // match → TRANSITIVE CLOSURE into entity clusters. Two planted
    // dirty variants per selected customer ('Kustomer#…' and
    // 'Cust0mer#…' prefix typos) each best-match their source by
    // levenshtein ≤ 1, and the two variants land in one cluster only
    // via transitivity (they are never compared to each other) —
    // exactly why production ER runs connected components over its
    // match pairs. Best-match edges (not all-above-threshold pairs)
    // keep near-identical serial names from chaining into giant
    // components. CC = the g5 min-label machinery; bounded: ≤ 1 edge
    // per dirty record
    "er8_identity_graph" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val sel = cust.filter(col("c_custkey") % 10 === 7)
      // perturbations live in the ALPHABETIC prefix (serial-number
      // names make digit-zone noise ambiguous: '…01X' is distance 1
      // from EVERY '…01d'); prefix edits keep the true source the
      // unique distance-1 neighbor while any other customer differs
      // by ≥ 1 digit on top
      def variant(expr0: org.apache.spark.sql.Column, slot: Int) =
        sel.select((col("c_custkey") * 10 + slot).as("d_ent"),
          expr0.as("dirty_name"))
      val dirty = variant(expr(
        "concat('K', substring(c_name, 2))"), 1) // Kustomer#…
        .unionAll(variant(expr(
          "concat('Cust0mer', substring(c_name, 9))"), 2)) // Cust0mer#…
      val edges = dirty
        .join(cust, substring(col("dirty_name"), 12, 5) ===
          substring(col("c_name"), 12, 5))
        .withColumn("dist", levenshtein(col("dirty_name"), col("c_name")))
        .filter(col("dist") <= 1)
        .groupBy(col("d_ent"))
        .agg(min_by(col("c_custkey"),
          struct(col("dist"), col("c_custkey"))).as("mk"))
        .select(col("d_ent").as("id_a"), (col("mk") * 10).as("id_b"))
      graft.graph.ConnectedComponents.run(edges)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("cluster_size"),
          collect_list(col("node")).as("ns"))
        .select(explode(col("ns")).as("entity_id"),
          col("component").as("cluster_id"), col("cluster_size"))
        .orderBy("entity_id")
    }),
    // INCREMENTAL ER against a persisted golden-record store (er9):
    // the production lifecycle er1–er8 stop short of. Seed = all
    // customers except %10=7. Batch 1: 'K…' typo variants of %10=3
    // (sources stored → matched) and of %10=7 (sources absent,
    // distance ≥ 2 to every stored name → NEW entities). Batch 2:
    // 'Kustomer0…' second-generation typos of the %10=7 names —
    // distance 1 from the DIRTY names batch 1 stored, ≥ 2 from
    // everything else, so they resolve ONLY because batch 1's new
    // entities joined the store — plus exact redeliveries of batch
    // 1's records, which match their own entity at distance 0 and
    // create nothing. er2's all-integer matcher; sequential-replay
    // oracle
    "er9_incremental_er" -> ((s, d) => {
      import graft.er.EntityStore
      val root = SinkQueries.tmp(s"er_store_${java.util.UUID
        .randomUUID().toString.take(8)}", d)
      val cust = table(s, d, "customer")
      EntityStore.init(cust.filter(col("c_custkey") % 10 =!= 7)
        .select(col("c_custkey").as("entity_id"),
          col("c_name").as("name")), root)
      def leg(mod: Int, slot: Int, nameExpr: String) =
        cust.filter(col("c_custkey") % 10 === mod)
          .select((col("c_custkey") * 100 + slot).as("record_id"),
            expr(nameExpr).as("name"))
      val kVar = "concat('K', substring(c_name, 2))"
      val b1 = leg(3, 1, kVar).unionAll(leg(7, 2, kVar))
      val r1 = EntityStore.ingest(s, root, b1)
      val b2 = leg(7, 3, "concat('Kustomer0', substring(c_name, 10))")
        .unionAll(leg(7, 4, kVar))
      val r2 = EntityStore.ingest(s, root, b2)
      r1.withColumn("batch", lit(1))
        .unionAll(r2.withColumn("batch", lit(2)))
        .orderBy("record_id")
    }),
    // er1's blocked fuzzy join with an EDIT-DISTANCE scorer instead of
    // Jaro-Winkler: integer levenshtein ≤ 2 over the same 5-char
    // blocking key, best match = min (distance, custkey) — all-integer
    // scoring, so not even a rounding convention to align
    "er2_edit_distance_match" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("d_key"),
          expr("""CASE CAST(c_custkey % 3 AS INT)
            | WHEN 0 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18, 1), substring(c_name, 17, 1))
            | WHEN 1 THEN concat(substring(c_name, 1, 16),
            |   substring(c_name, 18))
            | ELSE concat(substring(c_name, 1, 17), 'X')
            |END""".stripMargin).as("dirty_name"))
      dirty
        .join(cust,
          substring(col("dirty_name"), 12, 5) ===
            substring(col("c_name"), 12, 5))
        .withColumn("dist", levenshtein(col("dirty_name"), col("c_name")))
        .filter(col("dist") <= 2)
        .groupBy(col("d_key"), col("dirty_name"))
        .agg(min_by(
          struct(col("c_custkey"), col("c_name"), col("dist")),
          struct(col("dist"), col("c_custkey"))).as("m"))
        .select(col("d_key"), col("dirty_name"),
          col("m.c_custkey").as("matched_key"),
          col("m.c_name").as("matched_name"),
          col("m.dist").cast("long").as("edit_distance"))
        .orderBy("d_key")
    }),
    // er1/er2's third blocking strategy: a PHONETIC key. The consonant
    // skeleton (first char + vowels-stripped uppercase remainder, cut
    // to 8) is INVARIANT under vowel-level typos — exactly the errors
    // that slip through er1's positional substring block — so the
    // perturbed row always lands in its clean name's block. Same
    // bounded-candidate shape as er1/er2: skeletons partition the name
    // space, graft_jaro_winkler scores codegen'd inside the join, best
    // match is one min_by (no window over candidates). Perturbations
    // are all vowel edits (o→a, drop e, i→u) via plain replace() so
    // both engines regenerate the identical dirty set.
    "er3_phonetic_match" -> ((s, d) => {
      import graft.expr.JaroWinkler
      def phon(c: org.apache.spark.sql.Column) = {
        val u = upper(c)
        substring(concat(substring(u, 1, 1),
          regexp_replace(u.substr(lit(2), length(u)), "[AEIOU]", "")),
          1, 8)
      }
      val parts = table(s, d, "part")
      val dirty = parts.filter(col("p_partkey") % 10 === 3)
        .select(col("p_partkey").as("d_key"),
          expr("""CASE CAST(p_partkey % 3 AS INT)
            | WHEN 0 THEN replace(p_name, 'o', 'a')
            | WHEN 1 THEN replace(p_name, 'e', '')
            | ELSE replace(p_name, 'i', 'u')
            |END""".stripMargin).as("dirty_name"))
      dirty
        .join(parts, phon(col("dirty_name")) === phon(col("p_name")))
        .withColumn("jw",
          round(JaroWinkler.jw(col("dirty_name"), col("p_name")), 4))
        .filter(col("jw") >= 0.85)
        .groupBy(col("d_key"), col("dirty_name"))
        .agg(min_by(
          struct(col("p_partkey"), col("p_name"), col("jw")),
          struct((-col("jw")).as("nj"), col("p_partkey"))).as("m"))
        .select(col("d_key"), col("dirty_name"),
          col("m.p_partkey").as("matched_key"),
          col("m.p_name").as("matched_name"), col("m.jw").as("jw"))
        .orderBy("d_key")
    }),
    // GOLDEN-RECORD construction — what er1-er3's matching is FOR:
    // three record variants per seed entity (clean; vowel-typo name +
    // missing phone; dotted phone + missing segment) resolve to their
    // entity via the er1 block + codegen'd-JW best match, then
    // field-wise SURVIVORSHIP merges each cluster: most-frequent
    // non-null value, (count desc, value asc) tie-break — mode by
    // min_by, no window. Scale: matching is block-bounded like er1;
    // survivorship is two hash aggregates over the (entity, field,
    // value) long form, cluster-sized, never corpus²
    "er4_golden_record" -> ((s, d) => {
      import graft.expr.JaroWinkler
      val cust = table(s, d, "customer")
      val seeds = cust.filter(col("c_custkey") % 10 === 7)
      // the testdata customer has no phone column; synthesize one from
      // integer columns so both engines regenerate identical strings
      val phone = concat(lit("P-"),
        (col("c_custkey") % 1000).cast("string"), lit("-"),
        col("c_nationkey").cast("string"))
      def rec(off: Int, name: org.apache.spark.sql.Column,
          ph: org.apache.spark.sql.Column,
          seg: org.apache.spark.sql.Column) =
        seeds.select((col("c_custkey") * 4 + off).as("rec_id"),
          name.as("name"), ph.as("phone"), seg.as("segment"))
      val records =
        rec(0, col("c_name"), phone, col("c_mktsegment"))
          .unionByName(rec(1, regexp_replace(col("c_name"), "o", "a"),
            lit(null).cast("string"), col("c_mktsegment")))
          .unionByName(rec(2, col("c_name"),
            regexp_replace(phone, "-", "."),
            lit(null).cast("string")))
      val entity = records
        .join(cust.select(col("c_custkey"), col("c_name")),
          substring(col("name"), 12, 5) === substring(col("c_name"), 12, 5))
        .withColumn("jw",
          round(JaroWinkler.jw(col("name"), col("c_name")), 4))
        .filter(col("jw") >= 0.85)
        .groupBy(col("rec_id"))
        .agg(min_by(col("c_custkey"),
          struct((-col("jw")).as("nj"), col("c_custkey"))).as("entity"))
      val recsE = records.join(entity, "rec_id")
      graft.er.Survivorship.goldenRecords(recsE, "entity",
        Seq("name", "phone", "segment"))
        .select(col("entity"), col("golden_name"), col("golden_phone"),
          col("golden_segment"), col("n_records"), col("n_conflicts"))
        .orderBy("entity")
    })
  )

  val oracle: Map[String, String] = Map(
    // survivorship mode spelled as row_number over (cnt DESC, value);
    // entity assignment re-derived through the same block+JW best match
    // so a misassigned cluster in the engine would hash-mismatch here
    "er4_golden_record" ->
      """WITH seeds AS (SELECT * FROM customer WHERE c_custkey % 10 = 7),
        |records AS (
        |  SELECT c_custkey * 4 AS rec_id, c_name AS name,
        |    'P-' || CAST(c_custkey % 1000 AS VARCHAR) || '-' ||
        |      CAST(c_nationkey AS VARCHAR) AS phone,
        |    c_mktsegment AS segment FROM seeds
        |  UNION ALL SELECT c_custkey * 4 + 1, replace(c_name, 'o', 'a'),
        |    NULL, c_mktsegment FROM seeds
        |  UNION ALL SELECT c_custkey * 4 + 2, c_name,
        |    replace('P-' || CAST(c_custkey % 1000 AS VARCHAR) || '-' ||
        |      CAST(c_nationkey AS VARCHAR), '-', '.'), NULL FROM seeds),
        |ent AS (SELECT rec_id, entity FROM (
        |    SELECT r.rec_id, c.c_custkey AS entity,
        |      row_number() OVER (PARTITION BY r.rec_id ORDER BY
        |        round(jaro_winkler_similarity(r.name, c.c_name), 4) DESC,
        |        c.c_custkey) AS rn
        |    FROM records r JOIN customer c
        |      ON substr(r.name, 12, 5) = substr(c.c_name, 12, 5)
        |    WHERE round(jaro_winkler_similarity(r.name, c.c_name), 4)
        |      >= 0.85)
        |  WHERE rn = 1),
        |lng AS (
        |  SELECT e.entity, 'name' AS field, r.name AS value
        |  FROM records r JOIN ent e USING (rec_id) WHERE r.name IS NOT NULL
        |  UNION ALL SELECT e.entity, 'phone', r.phone
        |  FROM records r JOIN ent e USING (rec_id) WHERE r.phone IS NOT NULL
        |  UNION ALL SELECT e.entity, 'segment', r.segment
        |  FROM records r JOIN ent e USING (rec_id)
        |  WHERE r.segment IS NOT NULL),
        |modes AS (SELECT entity, field, value, n_values FROM (
        |    SELECT entity, field, value, cnt,
        |      row_number() OVER (PARTITION BY entity, field
        |        ORDER BY cnt DESC, value) AS rn,
        |      count(*) OVER (PARTITION BY entity, field) AS n_values
        |    FROM (SELECT entity, field, value, count(*) AS cnt
        |      FROM lng GROUP BY 1, 2, 3))
        |  WHERE rn = 1),
        |nr AS (SELECT e.entity, count(*) AS n_records
        |  FROM records r JOIN ent e USING (rec_id) GROUP BY 1)
        |SELECT nr.entity,
        |  max(CASE WHEN field = 'name' THEN value END) AS golden_name,
        |  max(CASE WHEN field = 'phone' THEN value END) AS golden_phone,
        |  max(CASE WHEN field = 'segment' THEN value END)
        |    AS golden_segment,
        |  max(nr.n_records) AS n_records,
        |  CAST(coalesce(
        |    sum(CASE WHEN n_values > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_conflicts
        |FROM nr LEFT JOIN modes m ON m.entity = nr.entity
        |GROUP BY nr.entity ORDER BY nr.entity"""
        .stripMargin.replace('\n', ' '),
    // DuckDB's jaro_winkler_similarity implements the same classic
    // algorithm (0.7 boost threshold, 0.1 prefix scale, cap 4 —
    // verified on the textbook pairs); 4-dp rounding absorbs last-bit
    // formula-grouping differences
    "er5_blocking_quality" -> (graft.er.BlockingMetrics.reportSql(
      """(SELECT c_custkey AS d_key,
        |  CASE c_custkey % 3
        |    WHEN 0 THEN concat(substr(c_name, 1, 16),
        |      substr(c_name, 18, 1), substr(c_name, 17, 1))
        |    WHEN 1 THEN concat(substr(c_name, 1, 16),
        |      substr(c_name, 18))
        |    ELSE concat(substr(c_name, 1, 17), 'X') END AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 7)"""
        .stripMargin.replace('\n', ' '),
      "customer",
      Seq(
        ("key_mid5", "substr(dirty_name, 12, 5)",
          "substr(c_name, 12, 5)"),
        ("key_mid3", "substr(dirty_name, 12, 3)",
          "substr(c_name, 12, 3)"),
        ("key_tail3", "substr(dirty_name, 16, 3)",
          "substr(c_name, 16, 3)"))) + " ORDER BY scheme"),
    // same blocked argmax on bp-quantized JW, same 5-threshold explode
    "er7_threshold_sweep" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key,
        |    CASE c_custkey % 3
        |      WHEN 0 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18, 1), substr(c_name, 17, 1))
        |      WHEN 1 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18))
        |      ELSE concat(substr(c_name, 1, 17), 'X') END AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 7),
        |cand AS (
        |  SELECT d_key, c_custkey,
        |    CAST(round(jaro_winkler_similarity(dirty_name, c_name)
        |      * 10000) AS BIGINT) AS bp
        |  FROM dirty JOIN customer
        |    ON substr(dirty_name, 12, 5) = substr(c_name, 12, 5)),
        |best AS (SELECT d_key, c_custkey AS mk, bp,
        |    row_number() OVER (PARTITION BY d_key
        |      ORDER BY bp DESC, c_custkey) AS rn
        |  FROM cand),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_dirty FROM dirty),
        |sw AS (SELECT t.threshold_bp,
        |    CAST(sum(CASE WHEN bp >= t.threshold_bp AND mk = d_key
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resolved,
        |    CAST(sum(CASE WHEN bp >= t.threshold_bp AND mk <> d_key
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong,
        |    CAST(sum(CASE WHEN bp < t.threshold_bp
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM (SELECT * FROM best WHERE rn = 1) b
        |  CROSS JOIN (SELECT unnest([8000, 8500, 9000, 9500, 9900])
        |    AS threshold_bp) t
        |  GROUP BY 1)
        |SELECT CAST(threshold_bp AS BIGINT) AS threshold_bp,
        |  n_resolved, n_wrong, n_dropped,
        |  CAST(n_resolved * 10000 // n_dirty AS BIGINT) AS recall_bp
        |FROM sw CROSS JOIN nd ORDER BY threshold_bp"""
        .stripMargin.replace('\n', ' '),
    // same frequency-based u estimation, identical 4-term score
    // expression, same decision bands and (score desc, key) pick
    "er6_fellegi_sunter" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS nn
        |  FROM customer),
        |sseg AS (SELECT CAST(sum(cc * cc) AS BIGINT) AS s_seg FROM
        |  (SELECT count(*) AS cc FROM customer GROUP BY c_mktsegment)),
        |snat AS (SELECT CAST(sum(cc * cc) AS BIGINT) AS s_nat FROM
        |  (SELECT count(*) AS cc FROM customer GROUP BY c_nationkey)),
        |sph AS (SELECT CAST(sum(cc * cc) AS BIGINT) AS s_ph FROM
        |  (SELECT count(*) AS cc FROM customer
        |   GROUP BY CAST(round(c_acctbal * 100) AS BIGINT) % 10000)),
        |w AS (SELECT
        |    ln(CAST('0.95' AS DOUBLE) / (CAST('1' AS DOUBLE) / nn))
        |      AS w_name_a,
        |    ln(CAST('0.05' AS DOUBLE)
        |      / (CAST('1' AS DOUBLE) - CAST('1' AS DOUBLE) / nn))
        |      AS w_name_d,
        |    ln(CAST('0.95' AS DOUBLE)
        |      / (CAST(s_seg AS DOUBLE) / (nn * nn))) AS w_seg_a,
        |    ln(CAST('0.05' AS DOUBLE) / (CAST('1' AS DOUBLE)
        |      - CAST(s_seg AS DOUBLE) / (nn * nn))) AS w_seg_d,
        |    ln(CAST('0.95' AS DOUBLE)
        |      / (CAST(s_nat AS DOUBLE) / (nn * nn))) AS w_nat_a,
        |    ln(CAST('0.05' AS DOUBLE) / (CAST('1' AS DOUBLE)
        |      - CAST(s_nat AS DOUBLE) / (nn * nn))) AS w_nat_d,
        |    ln(CAST('0.95' AS DOUBLE)
        |      / (CAST(s_ph AS DOUBLE) / (nn * nn))) AS w_ph_a,
        |    ln(CAST('0.05' AS DOUBLE) / (CAST('1' AS DOUBLE)
        |      - CAST(s_ph AS DOUBLE) / (nn * nn))) AS w_ph_d
        |  FROM nn CROSS JOIN sseg CROSS JOIN snat CROSS JOIN sph),
        |dirty AS (
        |  SELECT c_custkey AS d_key,
        |    CASE CAST(c_custkey % 3 AS INT)
        |      WHEN 0 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18, 1), substr(c_name, 17, 1))
        |      WHEN 1 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18))
        |      ELSE concat(substr(c_name, 1, 17), 'X') END AS d_name,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'MISMATCHED'
        |      ELSE c_mktsegment END AS d_seg,
        |    c_nationkey AS d_nat,
        |    CASE WHEN c_custkey % 2 = 0 THEN CAST(-1 AS BIGINT)
        |      ELSE CAST(round(c_acctbal * 100) AS BIGINT) % 10000
        |      END AS d_ph4
        |  FROM customer WHERE c_custkey % 10 = 7),
        |cand AS (
        |  SELECT d_key, c_custkey, round(
        |    (CASE WHEN round(jaro_winkler_similarity(d_name, c_name), 4)
        |        >= CAST('0.9' AS DOUBLE)
        |      THEN w_name_a ELSE w_name_d END) +
        |    (CASE WHEN d_seg = c_mktsegment
        |      THEN w_seg_a ELSE w_seg_d END) +
        |    (CASE WHEN d_nat = c_nationkey
        |      THEN w_nat_a ELSE w_nat_d END) +
        |    (CASE WHEN d_ph4 =
        |        CAST(round(c_acctbal * 100) AS BIGINT) % 10000
        |      THEN w_ph_a ELSE w_ph_d END), 6) AS score
        |  FROM dirty JOIN customer
        |    ON substr(d_name, 12, 5) = substr(c_name, 12, 5)
        |  CROSS JOIN w),
        |best AS (SELECT d_key, c_custkey AS matched_key, score,
        |    row_number() OVER (PARTITION BY d_key
        |      ORDER BY score DESC, c_custkey) AS rn
        |  FROM cand)
        |SELECT d_key, matched_key, score,
        |  CASE WHEN score > 10 THEN 'match'
        |    WHEN score > 0 THEN 'possible'
        |    ELSE 'non_match' END AS decision
        |FROM best WHERE rn = 1 ORDER BY d_key"""
        .stripMargin.replace('\n', ' '),
    "er1_fuzzy_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key,
        |    CASE c_custkey % 3
        |      WHEN 0 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18, 1), substr(c_name, 17, 1))
        |      WHEN 1 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18))
        |      ELSE concat(substr(c_name, 1, 17), 'X') END AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 7),
        |cand AS (
        |  SELECT d_key, dirty_name, c_custkey, c_name,
        |    round(jaro_winkler_similarity(dirty_name, c_name), 4) AS jw
        |  FROM dirty JOIN customer
        |    ON substr(dirty_name, 12, 5) = substr(c_name, 12, 5)),
        |best AS (
        |  SELECT d_key, dirty_name, c_custkey AS matched_key,
        |    c_name AS matched_name, jw,
        |    row_number() OVER (PARTITION BY d_key
        |      ORDER BY jw DESC, c_custkey) AS rn
        |  FROM cand WHERE jw >= CAST('0.9' AS DOUBLE))
        |SELECT d_key, dirty_name, matched_key, matched_name, jw
        |FROM best WHERE rn = 1 ORDER BY d_key"""
        .stripMargin.replace('\n', ' '),
    // same dirty variants, best-match edges, g5-style recursive
    // min-root closure
    "er8_identity_graph" ->
      """WITH RECURSIVE dirty AS (
        |  SELECT c_custkey * 10 + 1 AS d_ent,
        |    concat('K', substr(c_name, 2)) AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 7
        |  UNION ALL
        |  SELECT c_custkey * 10 + 2,
        |    concat('Cust0mer', substr(c_name, 9))
        |  FROM customer WHERE c_custkey % 10 = 7),
        |cand AS (SELECT d_ent, c_custkey,
        |    levenshtein(dirty_name, c_name) AS dist
        |  FROM dirty JOIN customer
        |    ON substr(dirty_name, 12, 5) = substr(c_name, 12, 5)),
        |best AS (SELECT d_ent, c_custkey AS mk FROM (
        |    SELECT d_ent, c_custkey,
        |      row_number() OVER (PARTITION BY d_ent
        |        ORDER BY dist, c_custkey) AS rn
        |    FROM cand WHERE dist <= 1) WHERE rn = 1),
        |e0 AS (SELECT d_ent AS id_a, mk * 10 AS id_b FROM best),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM e0
        |  UNION ALL SELECT id_b, id_a FROM e0),
        |reach(node, root) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN edges e
        |    ON e.src = r.node),
        |comp AS (SELECT node, min(root) AS cluster_id FROM reach
        |  GROUP BY 1),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
        |    AS cluster_size FROM comp GROUP BY 1)
        |SELECT comp.node AS entity_id, comp.cluster_id,
        |  sz.cluster_size
        |FROM comp JOIN sz USING (cluster_id)
        |ORDER BY entity_id""".stripMargin.replace('\n', ' '),
    // phonetic key: RE2 has no lookbehind/backrefs, so the skeleton is
    // built positionally (first char + vowel-stripped tail) — the same
    // construction the Spark side uses; 'g' flag = replace-all
    "er3_phonetic_match" ->
      """WITH dirty AS (
        |  SELECT p_partkey AS d_key,
        |    CASE CAST(p_partkey % 3 AS INT)
        |      WHEN 0 THEN replace(p_name, 'o', 'a')
        |      WHEN 1 THEN replace(p_name, 'e', '')
        |      ELSE replace(p_name, 'i', 'u') END AS dirty_name
        |  FROM part WHERE p_partkey % 10 = 3),
        |cand AS (
        |  SELECT d_key, dirty_name, p_partkey, p_name,
        |    round(jaro_winkler_similarity(dirty_name, p_name), 4) AS jw
        |  FROM dirty JOIN part ON
        |    substr(concat(substr(upper(dirty_name), 1, 1),
        |      regexp_replace(substr(upper(dirty_name), 2),
        |        '[AEIOU]', '', 'g')), 1, 8)
        |    = substr(concat(substr(upper(p_name), 1, 1),
        |      regexp_replace(substr(upper(p_name), 2),
        |        '[AEIOU]', '', 'g')), 1, 8)),
        |best AS (
        |  SELECT d_key, dirty_name, p_partkey AS matched_key,
        |    p_name AS matched_name, jw,
        |    row_number() OVER (PARTITION BY d_key
        |      ORDER BY jw DESC, p_partkey) AS rn
        |  FROM cand WHERE jw >= CAST('0.85' AS DOUBLE))
        |SELECT d_key, dirty_name, matched_key, matched_name, jw
        |FROM best WHERE rn = 1 ORDER BY d_key"""
        .stripMargin.replace('\n', ' '),
    // sequential replay: resolve batch 1 against the seed, grow the
    // store with its new entities, resolve batch 2 against the grown
    // store — the lifecycle as CTEs
    "er9_incremental_er" -> {
      def resolve(batch: String, store: String, out: String) =
        s"""cand_$out AS (
           |  SELECT b.record_id, b.name, s.entity_id,
           |    row_number() OVER (PARTITION BY b.record_id
           |      ORDER BY levenshtein(b.name, s.name), s.entity_id)
           |      AS rn
           |  FROM $batch b JOIN $store s
           |    ON substr(b.name, 12, 5) = substr(s.name, 12, 5)
           |    AND levenshtein(b.name, s.name) <= 1),
           |$out AS (
           |  SELECT b.record_id, b.name,
           |    coalesce(c.entity_id, b.record_id) AS entity_id,
           |    c.entity_id IS NULL AS is_new
           |  FROM $batch b LEFT JOIN
           |    (SELECT record_id, entity_id FROM cand_$out
           |     WHERE rn = 1) c
           |    ON b.record_id = c.record_id)"""
      s"""WITH seed AS (SELECT c_custkey AS entity_id, c_name AS name
         |  FROM customer WHERE c_custkey % 10 <> 7),
         |b1 AS (
         |  SELECT c_custkey * 100 + 1 AS record_id,
         |    concat('K', substr(c_name, 2)) AS name
         |  FROM customer WHERE c_custkey % 10 = 3
         |  UNION ALL SELECT c_custkey * 100 + 2,
         |    concat('K', substr(c_name, 2))
         |  FROM customer WHERE c_custkey % 10 = 7),
         |${resolve("b1", "seed", "r1")},
         |store2 AS (SELECT * FROM seed
         |  UNION ALL SELECT entity_id, name FROM r1 WHERE is_new),
         |b2 AS (
         |  SELECT c_custkey * 100 + 3 AS record_id,
         |    concat('Kustomer0', substr(c_name, 10)) AS name
         |  FROM customer WHERE c_custkey % 10 = 7
         |  UNION ALL SELECT c_custkey * 100 + 4,
         |    concat('K', substr(c_name, 2))
         |  FROM customer WHERE c_custkey % 10 = 7),
         |${resolve("b2", "store2", "r2")}
         |SELECT record_id, name, entity_id, is_new, batch FROM (
         |  SELECT *, 1 AS batch FROM r1
         |  UNION ALL SELECT *, 2 FROM r2)
         |ORDER BY record_id""".stripMargin.replace('\n', ' ')
    },
    "er2_edit_distance_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key,
        |    CASE c_custkey % 3
        |      WHEN 0 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18, 1), substr(c_name, 17, 1))
        |      WHEN 1 THEN concat(substr(c_name, 1, 16),
        |        substr(c_name, 18))
        |      ELSE concat(substr(c_name, 1, 17), 'X') END AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 7),
        |cand AS (
        |  SELECT d_key, dirty_name, c_custkey, c_name,
        |    levenshtein(dirty_name, c_name) AS dist
        |  FROM dirty JOIN customer
        |    ON substr(dirty_name, 12, 5) = substr(c_name, 12, 5)),
        |best AS (
        |  SELECT d_key, dirty_name, c_custkey AS matched_key,
        |    c_name AS matched_name, CAST(dist AS BIGINT)
        |      AS edit_distance,
        |    row_number() OVER (PARTITION BY d_key
        |      ORDER BY dist, c_custkey) AS rn
        |  FROM cand WHERE dist <= 2)
        |SELECT d_key, dirty_name, matched_key, matched_name,
        |  edit_distance
        |FROM best WHERE rn = 1 ORDER BY d_key"""
        .stripMargin.replace('\n', ' ')
  )
}
