package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{eventsTs, eventsUs, gold, table, withPipeline}
import graft.queries.ExtendedQueries.sessionize
import graft.text.TextAnalysis

/** Data-quality family: rule engines, quarantine, drift, Benford,
  * completeness/uniqueness profiling, reconciliation.
  *
  * Mechanically split out of ExtendedQueries (round 8, VERDICT ask #8)
  * — query keys and bodies unchanged; [[ExtendedQueries]] aggregates
  * the family maps so the driver contract is untouched. */
object DataQualityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deequ-style declarative quality report: every row-local rule
    // folds into ONE shared aggregate pass (conditional sums) and
    // unpivots driver-free; the uniqueness constraint is its own
    // count-distinct; the report is metadata-sized
    "dq1_quality_rules" -> ((s, d) => {
      import graft.quality.Checks
      val ev = table(s, d, "events")
      Checks.report(ev,
        rules = Seq(
          "value_non_negative" -> (col("value") >= 0),
          "value_below_cap" -> (col("value") <= 400),
          "event_type_known" ->
            col("event_type").isin("view", "click", "purchase", "signup"),
          "user_id_not_null" -> col("user_id").isNotNull),
        uniqueKeys = Seq("unique_event_id" -> Seq("event_id")))
        .orderBy("rule")
    }),
    // pipeline volume-anomaly gate (dq1's statistical sibling): daily
    // ingest counts vs a 3×MAD band around their median — the ops
    // check that catches a dead producer or a double-delivery day
    // BEFORE downstream aggregates drift. Day grain is calendar-
    // bounded (a few thousand rows at ANY SF), so the global median/
    // MAD rank-pick windows (the x42 machinery, one group) are safe;
    // the event-sized work is one partial-aggregatable daily count.
    // All integer: counts, lower-median rank-picks, and the 3·MAD
    // comparison — no rounding convention anywhere.
    "dq2_volume_anomaly" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = eventsUs(s, d)
        .groupBy(expr("us div 86400000000").as("day_num"))
        .agg(count(lit(1)).as("n_events"))
      def lowerMedian(df: DataFrame, c: String, tie: String,
          out: String) = {
        val w = Window.orderBy(col(c), col(tie))
        df.withColumn("rn", row_number().over(w))
          .withColumn("nd", count(lit(1)).over(
            Window.partitionBy(lit(1))))
          .filter(col("rn") === expr("(nd + 1) div 2"))
          .select(col(c).as(out))
      }
      val med = lowerMedian(daily, "n_events", "day_num", "med")
      val dev = daily.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("n_events") - col("med")))
      val mad = lowerMedian(dev, "dev", "day_num", "mad")
      dev.crossJoin(broadcast(mad))
        .select(col("day_num"), col("n_events"), col("med"), col("mad"),
          (col("dev") > lit(3) * col("mad")).as("is_anomaly"))
        .orderBy("day_num")
    }),
    // referential-integrity gate (the third dq check): orphan foreign
    // keys across the star schema's four FK edges. The child side
    // reduces to (fk, count) partials at scan speed before the
    // key-only anti join — child rows never ship — and each report
    // row is metadata-sized. The pipeline gate that catches a
    // truncated dimension load before every downstream join silently
    // drops facts.
    "dq3_referential_integrity" -> ((s, d) => {
      import graft.quality.Checks
      val li = table(s, d, "lineitem")
      Checks.referentialIntegrity(Seq(
        ("lineitem_orderkey", li, "l_orderkey",
          table(s, d, "orders").select(col("o_orderkey"))),
        ("lineitem_partkey", li, "l_partkey",
          table(s, d, "part").select(col("p_partkey"))),
        ("lineitem_suppkey", li, "l_suppkey",
          table(s, d, "supplier").select(col("s_suppkey"))),
        ("orders_custkey", table(s, d, "orders"), "o_custkey",
          table(s, d, "customer").select(col("c_custkey")))))
        .orderBy("rule")
    }),
    // freshness gate per event type (dq4, the fourth quality check):
    // lag of each type's LATEST event vs the 2024-02-01 logical run
    // instant against a 24.5 h SLO — the dead-producer alarm whose
    // historical volume still looks normal. One (key → max, count)
    // partial-aggregatable pass; explicit as-of keeps it replayable
    "dq4_freshness" -> ((s, d) => {
      import graft.quality.Checks
      val ev = eventsUs(s, d)
      Checks.freshness(ev, "event_type", col("us"),
        asOfMicros = 1706745600000000L, maxLagSeconds = 88200L)
        .orderBy("event_type")
    }),
    // column PROFILE (dq6, the sixth quality check — the ingest-time
    // profiler next to the rule report): per column, rows / nulls /
    // exact distincts / typed min-max lanes, ALL from one shared
    // aggregate pass unpivoted driver-free into |columns| report rows
    // BATCH-OVER-BATCH PROFILE DRIFT (dq10): dq6's one-pass profile
    // run on a reference and a current ingest batch, diffed per
    // column — the every-ingest monitoring gate (Deequ metrics-diff).
    // The harness plants realistic drift into the current batch: a
    // collector regression NULLs value for user_id % 19 == 0 (+5.3pp
    // null rate → drifted) and renames click → tap for
    // user_id % 7 == 0 (a 5th event_type; distinct ratio 1.25× —
    // within the halved/doubled gate, NOT flagged — the operator
    // distinguishes noisy from broken). user_id stays clean
    "dq10_profile_drift" -> ((s, d) => {
      import graft.quality.Checks
      val ev = table(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val ref = ev.filter(col("event_id") % 2 === 0)
      val cur = ev.filter(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("user_id") % 19 === 0, lit(null)).otherwise(col("value")))
        .withColumn("event_type",
          when(col("user_id") % 7 === 0 && col("event_type") === "click",
            lit("tap")).otherwise(col("event_type")))
      Checks.profileDrift(ref, cur,
        numericCols = Seq("user_id", "value"),
        stringCols = Seq("event_type"))
    }),
    // two-sample KS drift test (dq11): the distribution-SHAPE gate
    // dq10's profile can't see — the harness plants a scale shift
    // (half of cur's users get value ×1.5: same null rate, same
    // distinct ratio, but D=0.092 ≫ crit 0.027 → drifted) while
    // user_id splits evenly (D ≈ 0 → quiet). Verdict is the
    // pure-integer squared-form gate; see Checks.ksTest
    "dq11_ks_test" -> ((s, d) => {
      import graft.quality.Checks
      val ev = table(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val ref = ev.filter(col("event_id") % 2 === 0)
      val cur = ev.filter(col("event_id") % 2 === 1)
        .withColumn("value",
          when(col("user_id") % 2 === 0, col("value") * lit(1.5d))
            .otherwise(col("value")))
      Checks.ksTest(ref, cur, Seq(
        "value" -> expr("CAST(floor(value * 10000D) AS BIGINT)"),
        "user_id" -> col("user_id")))
    }),
    // join-key skew report (dq12): rows-per-key percentiles for every
    // candidate join/partition key of the fact table — the diagnostic
    // that decides SALTING before a skewed key decides it for you at
    // 3 a.m. The scalable trick is the COUNT-OF-COUNTS histogram:
    // (key → rows) reduces to (rows_per_key → n_keys), whose grain is
    // bounded by the maximum multiplicity, not the key cardinality —
    // so the percentile rank-picks run over a metadata-sized table
    // even when the key grain is corpus-sized (l_orderkey). All keys
    // ride ONE fact pass via row-local explode (the dq11 shape); all
    // outputs exact integers (p99 by the cum*100 ≥ n*99 x79
    // discipline, hot key = min key among the argmax)
    "dq12_key_skew" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = table(s, d, "lineitem")
      val keyed = li.select(explode(array(
        struct(lit("l_suppkey").as("k"), col("l_suppkey").as("key")),
        struct(lit("l_partkey").as("k"), col("l_partkey").as("key")),
        struct(lit("l_orderkey").as("k"), col("l_orderkey").as("key"))))
        .as("e"))
        .select(col("e.k").as("k"), col("e.key").as("key"))
      val counts = keyed.groupBy(col("k"), col("key"))
        .agg(count(lit(1)).as("c"))
      // carry min(key) per (k, c) into the histogram so the hot-key
      // argmax derives from the multiplicity-bounded table too —
      // everything downstream of this line reads histogram rows, so
      // the FACT table is scanned exactly once
      val hist = counts.groupBy(col("k"), col("c"))
        .agg(count(lit(1)).as("nk"), min(col("key")).as("min_key"))
      val w = Window.partitionBy(col("k")).orderBy(col("c"))
      val wAll = Window.partitionBy(col("k"))
      val ranked = hist
        .withColumn("cum", sum(col("nk")).over(w))
        .withColumn("n_keys", sum(col("nk")).over(wAll))
        .withColumn("total_rows", sum(col("c") * col("nk")).over(wAll))
        .withColumn("max_rows", max(col("c")).over(wAll))
      val picks = ranked.groupBy(col("k"), col("n_keys"),
          col("total_rows"), col("max_rows"))
        .agg(
          min(when(col("cum") * 2 >= col("n_keys") + 1, col("c")))
            .as("p50_rows"),
          min(when(col("cum") * 100 >= col("n_keys") * 99, col("c")))
            .as("p99_rows"),
          min(when(col("c") === col("max_rows"), col("min_key")))
            .as("hot_key"))
      picks
        .select(col("k").as("key_name"), col("n_keys"),
          col("total_rows"), col("max_rows"), col("p50_rows"),
          col("p99_rows"),
          expr("(max_rows * 1000000) div p50_rows").as("skew_ratio_e6"),
          col("hot_key"))
        .orderBy("key_name")
    }),
    "dq6_column_profile" -> ((s, d) => {
      val ev = eventsUs(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          col("us"))
      graft.quality.Checks.profile(ev,
        numericCols = Seq("user_id", "value", "us"),
        stringCols = Seq("event_type"))
        .orderBy("column")
    }),
    // ROW-LEVEL QUARANTINE (dq8): the transformation half of the
    // quality stack — failing rows routed out with the comma-joined
    // violated-rule tags (dead-letter payload); NULL rule results
    // violate, per the dq1 contract; scan-speed CASE arms, no shuffle
    "dq8_quarantine" -> ((s, d) =>
      graft.quality.Checks.quarantine(
        table(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value")),
        Seq(
          "value_le_450" -> (col("value") <= 450),
          "value_ge_1" -> (col("value") >= 1),
          "type_known" -> col("event_type").isin(
            "view", "click", "purchase", "signup")))
        .orderBy("event_id")),
    // BENFORD first-digit test (dq9): the fraud / data-fabrication
    // screen — first digits of natural multi-magnitude positive
    // quantities follow P(d)=log10(1+1/d); the χ² against that law is
    // the audit readout. One scan to the 9-row digit histogram; first
    // digit via the decimal STRING of the integer cents (no float
    // log10 boundary risk); expected shares are precomputed 6dp
    // literals shared with the oracle; χ² terms are fixed trees
    // rounded 6dp and DECIMAL-summed
    "dq9_benford" -> ((s, d) =>
      graft.quality.Benford.firstDigitTest(
        table(s, d, "orders")
          .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            .as("cents")),
        "cents")
        .orderBy("digit")),
    // FUNCTIONAL-DEPENDENCY / candidate-key profiler (dq7, the
    // seventh quality check): does every LHS group determine one RHS
    // value? One (lhs → distinct-rhs, count) aggregate per asserted
    // dependency, metadata-sized report; event_id→user_id and
    // doc_id→lang assert real keys, user_id→event_type and
    // source→lang are the expected-fail discovery probes
    "dq7_fd_check" -> ((s, d) => {
      val ev = eventsUs(s, d)
      val docs = table(s, d, "documents")
      graft.quality.Checks.functionalDependencies(Seq(
        ("doc_id_determines_lang", docs, Seq("doc_id"), "lang"),
        ("event_id_determines_user", ev, Seq("event_id"), "user_id"),
        ("source_determines_lang", docs, Seq("source"), "lang"),
        ("user_determines_type", ev, Seq("user_id"), "event_type")))
        .orderBy("rule")
    }),
    // CATEGORICAL drift gate (dq5 — ml12's categorical sibling, the
    // fifth quality check): ref-vs-current event-type distribution
    // compared by chi-square contribution per category. Both sides
    // reduce to |categories|-row count tables at scan speed; expected
    // counts and chi² terms are the same double expressions of exact
    // integer operands in both engines, 6dp-rounded; a category
    // absent from ref (expected 0) yields a NULL term, not an ε fudge
    "dq5_categorical_drift" -> ((s, d) => {
      import graft.quality.Checks
      val ev = eventsUs(s, d)
      val cutoff = 1705795200000000L // 2024-01-21 00:00:00 UTC µs
      Checks.categoricalDrift(
        ev.filter(col("us") < cutoff),
        ev.filter(col("us") >= cutoff), "event_type")
        .orderBy("event_type")
    }),
    // SCHEMA-DRIFT GATE (dq13, round-8 VERDICT ask #8): diff an
    // incoming batch's schema against the reference table's — added /
    // removed / type-changed columns — the STRUCTURAL gate that runs
    // before any value profile can (dq10 cannot even profile a column
    // whose type changed). The batch plants all three drift classes:
    // lang dropped, quality_score added (DOUBLE), doc_id narrowed to
    // INTEGER. Both engines INTROSPECT their own schemas (Spark
    // StructType; DuckDB information_schema.columns + DESCRIBE) —
    // neither side hardcodes the expected column list, so a green row
    // certifies the drift computation end to end. Metadata-sized: no
    // row of either frame is scanned.
    "dq13_schema_drift" -> ((s, d) => {
      val ref = table(s, d, "documents")
      val cur = ref.drop("lang")
        .withColumn("doc_id", col("doc_id").cast("int"))
        .withColumn("quality_score", lit(0.5).cast("double"))
      graft.quality.SchemaDrift.drift(s, ref, cur)
        .orderBy("column_name")
    })
  )

  val oracle: Map[String, String] = Map(
    // one scalar CTE mirrors the single shared aggregate; CASE WHEN p
    // THEN 0 ELSE 1 reproduces the null-is-violation rule
    "dq1_quality_rules" ->
      """WITH t AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS v_nonneg,
        |  CAST(sum(CASE WHEN value <= 400 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS v_cap,
        |  CAST(sum(CASE WHEN event_type IN
        |    ('view', 'click', 'purchase', 'signup') THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_type,
        |  CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_user,
        |  count(*) - count(DISTINCT event_id) AS v_uniq
        |  FROM events),
        |r AS (
        |  SELECT 'value_non_negative' AS rule, v_nonneg AS n_violations,
        |    n_rows FROM t
        |  UNION ALL SELECT 'value_below_cap', v_cap, n_rows FROM t
        |  UNION ALL SELECT 'event_type_known', v_type, n_rows FROM t
        |  UNION ALL SELECT 'user_id_not_null', v_user, n_rows FROM t
        |  UNION ALL SELECT 'unique_event_id', v_uniq, n_rows FROM t)
        |SELECT rule, n_violations, n_rows, n_violations = 0 AS pass
        |FROM r ORDER BY rule""".stripMargin.replace('\n', ' '),
    // same lower-median rank-picks at the day grain; epoch_us // µs-per-
    // day matches Spark's canonical-µs `us div 86400000000`
    "dq2_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day_num,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1),
        |md AS (SELECT n_events AS med FROM (
        |    SELECT n_events,
        |      row_number() OVER (ORDER BY n_events, day_num) AS rn,
        |      count(*) OVER () AS nd
        |    FROM daily) WHERE rn = (nd + 1) // 2),
        |dv AS (SELECT day_num, n_events, med,
        |    abs(n_events - med) AS dev
        |  FROM daily CROSS JOIN md),
        |mad AS (SELECT dev AS mad FROM (
        |    SELECT dev,
        |      row_number() OVER (ORDER BY dev, day_num) AS rn,
        |      count(*) OVER () AS nd
        |    FROM dv) WHERE rn = (nd + 1) // 2)
        |SELECT day_num, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
        |  dev > 3 * mad AS is_anomaly
        |FROM dv CROSS JOIN mad ORDER BY day_num"""
        .stripMargin.replace('\n', ' '),
    // same child-side (fk, count) reduction; LEFT JOIN ... IS NULL is
    // the null-safe anti join (NOT IN would vanish on a NULL key)
    "dq3_referential_integrity" ->
      """WITH c AS (
        |  SELECT 'lineitem_orderkey' AS rule, l_orderkey AS fk,
        |    count(*) AS n FROM lineitem GROUP BY 1, 2
        |  UNION ALL SELECT 'lineitem_partkey', l_partkey, count(*)
        |    FROM lineitem GROUP BY 1, 2
        |  UNION ALL SELECT 'lineitem_suppkey', l_suppkey, count(*)
        |    FROM lineitem GROUP BY 1, 2
        |  UNION ALL SELECT 'orders_custkey', o_custkey, count(*)
        |    FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT 'lineitem_orderkey' AS rule, o_orderkey AS pk
        |    FROM orders
        |  UNION ALL SELECT 'lineitem_partkey', p_partkey FROM part
        |  UNION ALL SELECT 'lineitem_suppkey', s_suppkey FROM supplier
        |  UNION ALL SELECT 'orders_custkey', c_custkey FROM customer),
        |o AS (SELECT c.rule,
        |    count(*) FILTER (WHERE p.pk IS NULL) AS n_orphan_keys,
        |    coalesce(sum(c.n) FILTER (WHERE p.pk IS NULL), 0)
        |      AS n_orphan_rows
        |  FROM c LEFT JOIN p ON c.rule = p.rule AND c.fk = p.pk
        |  GROUP BY 1),
        |t AS (
        |  SELECT 'lineitem_orderkey' AS rule, count(*) AS n_child_rows
        |    FROM lineitem
        |  UNION ALL SELECT 'lineitem_partkey', count(*) FROM lineitem
        |  UNION ALL SELECT 'lineitem_suppkey', count(*) FROM lineitem
        |  UNION ALL SELECT 'orders_custkey', count(*) FROM orders)
        |SELECT t.rule AS rule,
        |  CAST(coalesce(n_orphan_keys, 0) AS BIGINT) AS n_orphan_keys,
        |  CAST(coalesce(n_orphan_rows, 0) AS BIGINT) AS n_orphan_rows,
        |  CAST(n_child_rows AS BIGINT) AS n_child_rows,
        |  coalesce(n_orphan_rows, 0) = 0 AS pass
        |FROM t LEFT JOIN o ON o.rule = t.rule ORDER BY t.rule"""
        .stripMargin.replace('\n', ' '),
    // same |categories|-row reduction; chi² terms as the identical
    // double expression, NULL when the category is absent from ref
    "dq5_categorical_drift" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |r AS (SELECT event_type, count(*) AS n_ref FROM ev
        |  WHERE us < 1705795200000000 GROUP BY 1),
        |c AS (SELECT event_type, count(*) AS n_cur FROM ev
        |  WHERE us >= 1705795200000000 GROUP BY 1),
        |j AS (SELECT coalesce(r.event_type, c.event_type) AS event_type,
        |    CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
        |    CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM r FULL OUTER JOIN c ON r.event_type = c.event_type),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
        |SELECT event_type, n_ref, n_cur,
        |  CASE WHEN tr > 0
        |    THEN round(CAST(n_ref AS DOUBLE) / tr * tc, 6) END
        |    AS expected_cur,
        |  CASE WHEN n_ref > 0 THEN round(
        |    (CAST(n_cur AS DOUBLE) - CAST(n_ref AS DOUBLE) / tr * tc) *
        |    (CAST(n_cur AS DOUBLE) - CAST(n_ref AS DOUBLE) / tr * tc) /
        |    (CAST(n_ref AS DOUBLE) / tr * tc), 6) END AS chi2_term
        |FROM j CROSS JOIN t ORDER BY event_type"""
        .stripMargin.replace('\n', ' '),
    // same IS-DISTINCT-FROM-TRUE violation semantics and rule order
    "dq8_quarantine" ->
      """SELECT event_id, user_id, event_type, value,
        |  concat_ws(',',
        |    CASE WHEN (value <= 450) IS DISTINCT FROM TRUE
        |      THEN 'value_le_450' END,
        |    CASE WHEN (value >= 1) IS DISTINCT FROM TRUE
        |      THEN 'value_ge_1' END,
        |    CASE WHEN (event_type IN ('view', 'click', 'purchase',
        |      'signup')) IS DISTINCT FROM TRUE
        |      THEN 'type_known' END) AS violated
        |FROM events
        |WHERE NOT (coalesce(value <= 450, FALSE)
        |    AND coalesce(value >= 1, FALSE)
        |    AND coalesce(event_type IN ('view', 'click', 'purchase',
        |      'signup'), FALSE))
        |ORDER BY event_id""".stripMargin.replace('\n', ' '),
    // same digit-string extraction, 6dp literal shares, fixed χ² tree,
    // decimal total
    "dq9_benford" ->
      """WITH law AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
        |    unnest([CAST('0.301030' AS DOUBLE), CAST('0.176091' AS DOUBLE),
        |      CAST('0.124939' AS DOUBLE), CAST('0.096910' AS DOUBLE),
        |      CAST('0.079181' AS DOUBLE), CAST('0.066947' AS DOUBLE),
        |      CAST('0.057992' AS DOUBLE), CAST('0.051153' AS DOUBLE),
        |      CAST('0.045757' AS DOUBLE)]) AS exp_share),
        |src AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
        |cnt AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |    AS digit, CAST(count(*) AS BIGINT) AS n_obs
        |  FROM src GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM src),
        |terms AS (SELECT law.digit,
        |    coalesce(n_obs, CAST(0 AS BIGINT)) AS n_obs, exp_share, n
        |  FROM law LEFT JOIN cnt ON law.digit = cnt.digit CROSS JOIN nn),
        |t2 AS (SELECT digit, n_obs,
        |    round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS obs_share, exp_share,
        |    round((CAST(n_obs AS DOUBLE) - exp_share * CAST(n AS DOUBLE)) *
        |      (CAST(n_obs AS DOUBLE) - exp_share * CAST(n AS DOUBLE)) /
        |      (exp_share * CAST(n AS DOUBLE)), 6) AS chi2_term
        |  FROM terms)
        |SELECT digit, n_obs, obs_share, exp_share, chi2_term,
        |  CAST(sum(CAST(chi2_term AS DECIMAL(38,6))) OVER () AS DOUBLE)
        |    AS chi2_total
        |FROM t2 ORDER BY digit""".stripMargin.replace('\n', ' '),
    // one aggregate per dependency, NULL RHS abstains (count DISTINCT
    // ignores NULLs in both engines)
    "dq7_fd_check" -> {
      def fd(name: String, tbl: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS rule, count(*) AS n_groups,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating_groups,
           |  coalesce(CAST(sum(CASE WHEN nd > 1 THEN c ELSE 0 END)
           |    AS BIGINT), 0) AS n_violating_rows,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    = 0 AS pass
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd,
           |  count(*) AS c FROM $tbl GROUP BY $lhs)""".stripMargin
      s"""${Seq(
          fd("doc_id_determines_lang", "documents", "doc_id", "lang"),
          fd("event_id_determines_user", "events", "event_id",
            "user_id"),
          fd("source_determines_lang", "documents", "source", "lang"),
          fd("user_determines_type", "events", "user_id",
            "event_type")).mkString(" UNION ALL ")}
         |ORDER BY rule""".stripMargin.replace('\n', ' ')
    },
    // one SELECT per column unioned (oracle runs at test scale; the
    // engine side is the single shared aggregate)
    "dq10_profile_drift" -> graft.quality.Checks.profileDriftSql(
      refRel = "(SELECT user_id, event_type, value FROM events " +
        "WHERE event_id % 2 = 0)",
      curRel = """(SELECT user_id,
        |  CASE WHEN user_id % 7 = 0 AND event_type = 'click'
        |    THEN 'tap' ELSE event_type END AS event_type,
        |  CASE WHEN user_id % 19 = 0 THEN NULL ELSE value END AS value
        |  FROM events WHERE event_id % 2 = 1)"""
        .stripMargin.replace('\n', ' '),
      numericCols = Seq("user_id", "value"),
      stringCols = Seq("event_type")),
    "dq11_ks_test" -> graft.quality.Checks.ksTestSql(
      refRel = "(SELECT user_id, value FROM events WHERE event_id % 2 = 0)",
      curRel = """(SELECT user_id,
        |  CASE WHEN user_id % 2 = 0
        |    THEN value * CAST('1.5' AS DOUBLE) ELSE value END AS value
        |  FROM events WHERE event_id % 2 = 1)"""
        .stripMargin.replace('\n', ' '),
      metrics = Seq(
        "value" ->
          "CAST(floor(value * CAST('10000' AS DOUBLE)) AS BIGINT)",
        "user_id" -> "user_id")),
    // same count-of-counts reduction; the three keys union instead of
    // exploding (oracle runs at test scale)
    "dq12_key_skew" ->
      """WITH keyed AS (
        |  SELECT 'l_suppkey' AS k, l_suppkey AS key FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', l_orderkey FROM lineitem),
        |counts AS (SELECT k, key, count(*) AS c FROM keyed
        |  GROUP BY 1, 2),
        |hist AS (SELECT k, c, count(*) AS nk, min(key) AS min_key
        |  FROM counts GROUP BY 1, 2),
        |ranked AS (SELECT k, c, nk, min_key,
        |    sum(nk) OVER (PARTITION BY k ORDER BY c) AS cum,
        |    sum(nk) OVER (PARTITION BY k) AS n_keys,
        |    sum(c * nk) OVER (PARTITION BY k) AS total_rows,
        |    max(c) OVER (PARTITION BY k) AS max_rows
        |  FROM hist),
        |picks AS (SELECT k, n_keys, total_rows, max_rows,
        |    min(CASE WHEN cum * 2 >= n_keys + 1 THEN c END)
        |      AS p50_rows,
        |    min(CASE WHEN cum * 100 >= n_keys * 99 THEN c END)
        |      AS p99_rows,
        |    min(CASE WHEN c = max_rows THEN min_key END) AS hot_key
        |  FROM ranked GROUP BY 1, 2, 3, 4)
        |SELECT k AS key_name, CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(total_rows AS BIGINT) AS total_rows,
        |  CAST(max_rows AS BIGINT) AS max_rows,
        |  CAST(p50_rows AS BIGINT) AS p50_rows,
        |  CAST(p99_rows AS BIGINT) AS p99_rows,
        |  CAST((max_rows * 1000000) // p50_rows AS BIGINT)
        |    AS skew_ratio_e6,
        |  hot_key
        |FROM picks ORDER BY key_name""".stripMargin.replace('\n', ' '),
    "dq6_column_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num,
           |  CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str,
           |  CAST(NULL AS VARCHAR) AS max_str FROM ev""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', count(*),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT),
           |  count(DISTINCT $c),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  min($c), max($c) FROM ev""".stripMargin
      s"""WITH ev AS (SELECT user_id, event_type, value,
         |    epoch_us(ts) AS us FROM events)
         |${Seq(num("user_id"), num("value"), num("us"),
              str("event_type")).mkString(" UNION ALL ")}
         |ORDER BY "column"""".stripMargin.replace('\n', ' ')
    },
    // lag floored at 0 in BOTH engines (so DuckDB's flooring // and
    // Spark's truncating div never see a negative operand); a
    // future-dated partition fails via the max(ts) <= as-of conjunct
    "dq4_freshness" ->
      """SELECT event_type, max(ts) AS latest_ts,
        |  count(*) AS n_rows,
        |  greatest(0, (1706745600000000 - epoch_us(max(ts))) // 1000000)
        |    AS lag_s,
        |  (greatest(0,
        |     (1706745600000000 - epoch_us(max(ts))) // 1000000) <= 88200
        |   AND epoch_us(max(ts)) <= 1706745600000000) AS pass
        |FROM events GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace('\n', ' '),
    "dq13_schema_drift" -> graft.quality.SchemaDrift.driftSql(
      "documents",
      "SELECT CAST(doc_id AS INTEGER) AS doc_id, text, source, " +
        "n_chars, CAST(0.5 AS DOUBLE) AS quality_score FROM documents")
  )
}
