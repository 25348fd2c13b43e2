package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ-style constraint report):
  * given row-local rules and uniqueness constraints, produce one small
  * report row per rule with its violation count.
  *
  * Scale design: every row-local rule folds into ONE shared hash
  * aggregate over the data (conditional sums — a single pass at scan
  * speed, no matter how many rules), then unpivots the one result row
  * into per-rule rows driver-free. Each uniqueness constraint is its
  * own count-distinct aggregate (inherently a shuffle on the key), and
  * everything unions into a metadata-sized report. Nothing collects;
  * adding a rule adds a column to one aggregate, not a pass.
  */
object Checks {

  /** Violation report. `rules`: (name, predicate) where the predicate
    * must hold for a row to PASS — null predicates count as violations
    * (SQL three-valued logic must not silently pass). `uniqueKeys`:
    * (name, key columns) — violations = rows in excess of one per
    * distinct key combination. */
  def report(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty, "at least one row-local rule required")
    val aggs = rules.map { case (n, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"v_$n")
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rowLocal = one.select(explode(array(rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"v_$n").as("n_violations"),
        col("n_rows"))
    }: _*)).as("r")).select(col("r.rule"), col("r.n_violations"),
      col("r.n_rows"))
    val uniq = uniqueKeys.map { case (n, ks) =>
      df.agg(
        (count(lit(1)) - countDistinct(col(ks.head), ks.tail.map(col): _*))
          .as("n_violations"),
        count(lit(1)).as("n_rows"))
        .select(lit(n).as("rule"), col("n_violations"), col("n_rows"))
    }
    (rowLocal +: uniq).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0)
  }

  /** Referential-integrity report: for each (rule, child, fkCol,
    * parentKeys) constraint, count child rows whose foreign key has no
    * match in the parent's key set (NULL foreign keys are orphans —
    * an FK that identifies nothing fails the constraint, mirroring
    * [[report]]'s explicit null rule).
    *
    * Scale design: the child side reduces FIRST to (fk, n_rows)
    * partials — one partial-aggregatable pass at scan speed — so the
    * anti join ships only distinct keys, never child rows; the parent
    * side is a key-only projection (column-pruned at the scan). Each
    * constraint's report row is two metadata-sized aggregates. */
  def referentialIntegrity(
      constraints: Seq[(String, DataFrame, String, DataFrame)])
      : DataFrame = {
    require(constraints.nonEmpty, "at least one constraint required")
    constraints.map { case (rule, child, fkCol, parentKeys) =>
      require(parentKeys.columns.length == 1,
        s"parentKeys for $rule must be a single key column, got " +
          parentKeys.columns.mkString("(", ", ", ")"))
      val pk = parentKeys.columns.head
      val fks = child.groupBy(col(fkCol)).agg(count(lit(1)).as("n"))
      val orphans = fks.join(parentKeys,
        fks(fkCol) === parentKeys(pk), "left_anti")
      val tot = child.agg(count(lit(1)).as("n_child_rows"))
      orphans.agg(
        count(lit(1)).as("n_orphan_keys"),
        coalesce(sum(col("n")), lit(0L)).as("n_orphan_rows"))
        .crossJoin(broadcast(tot))
        .select(lit(rule).as("rule"), col("n_orphan_keys"),
          col("n_orphan_rows"), col("n_child_rows"),
          (col("n_orphan_rows") === 0).as("pass"))
    }.reduce(_.unionByName(_))
  }

  /** Column profile — the table-profiling report every lake runs on
    * ingest (the Deequ/Great-Expectations "profiler" next to the rule
    * report): per column, row count, null count, exact distinct count,
    * and min/max (numeric columns in `min_num`/`max_num`, string
    * columns in `min_str`/`max_str` — typed lanes instead of a
    * cast-to-string that engines format differently).
    *
    * Scale: ONE shared aggregate pass computes every per-column
    * statistic (count/null/min/max fold into conditional aggregates;
    * each exact distinct is its own partial-aggregatable
    * count-distinct inside the same aggregate), then the single result
    * row unpivots driver-free into |columns| report rows. Adding a
    * column adds aggregate slots, never a pass. */
  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty,
      "at least one column required")
    val aggs =
      numericCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))) ++
      stringCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"))) :+
      count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numericCols.map(c => struct(lit(c).as("column"), col("n_rows"),
        col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))) ++
      stringCols.map(c => struct(lit(c).as("column"), col("n_rows"),
        col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str")))
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Batch-over-batch PROFILE drift (dq10): [[profile]] run on a
    * reference and a current batch, joined per column — the schema- and
    * distribution-monitoring pass a production feed runs on every
    * ingest (Deequ's metrics-repository diff; the profile-level
    * complement of dq5's per-category chi-square and ml12's PSI, which
    * watch ONE column deeply — this watches EVERY column cheaply).
    * Two one-pass aggregates → two |columns|-row tables → a tiny join:
    * corpus-sized work is exactly two scans regardless of column
    * count. Null rates and the distinct-count ratio are exact e6
    * integers by truncating division on non-negative counts;
    * range_expanded compares STORED extrema (no arithmetic, numeric
    * columns only — string collation is engine-dependent); the drifted
    * flag ORs coalesced(…, false) terms so a NULL metric (empty ref,
    * string column) never poisons the verdict: |Δnull| > 1pp or
    * distinct count halved/doubled. */
  def profileDrift(ref: DataFrame, cur: DataFrame,
      numericCols: Seq[String], stringCols: Seq[String]): DataFrame = {
    def leg(df: DataFrame, tag: String) =
      profile(df, numericCols, stringCols).select(
        col("column"), col("n_rows").as(s"n_rows_$tag"),
        col("n_null").as(s"n_null_$tag"),
        col("n_distinct").as(s"nd_$tag"),
        col("min_num").as(s"min_$tag"), col("max_num").as(s"max_$tag"))
    leg(ref, "ref").join(leg(cur, "cur"), Seq("column"))
      .withColumn("null_rate_ref_e6", expr(
        "CASE WHEN n_rows_ref > 0 " +
          "THEN (n_null_ref * 1000000) div n_rows_ref END"))
      .withColumn("null_rate_cur_e6", expr(
        "CASE WHEN n_rows_cur > 0 " +
          "THEN (n_null_cur * 1000000) div n_rows_cur END"))
      .withColumn("null_drift_e6",
        col("null_rate_cur_e6") - col("null_rate_ref_e6"))
      .withColumn("distinct_ratio_e6", expr(
        "CASE WHEN nd_ref > 0 THEN (nd_cur * 1000000) div nd_ref END"))
      .withColumn("range_expanded",
        col("min_cur") < col("min_ref") || col("max_cur") > col("max_ref"))
      .withColumn("drifted",
        coalesce(abs(col("null_drift_e6")) > 10000, lit(false)) ||
          coalesce(col("distinct_ratio_e6") < 500000, lit(false)) ||
          coalesce(col("distinct_ratio_e6") > 2000000, lit(false)))
      .select(col("column"), col("n_rows_ref"), col("n_rows_cur"),
        col("null_rate_ref_e6"), col("null_rate_cur_e6"),
        col("null_drift_e6"), col("nd_ref"), col("nd_cur"),
        col("distinct_ratio_e6"), col("range_expanded"), col("drifted"))
      .orderBy("column")
  }

  /** DuckDB twin of [[profileDrift]]; `refRel`/`curRel` are
    * parenthesized relations with the profiled columns. */
  def profileDriftSql(refRel: String, curRel: String,
      numericCols: Seq[String], stringCols: Seq[String]): String = {
    def prof(rel: String) = {
      def num(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num,
           |  CAST(max($c) AS DOUBLE) AS max_num FROM $rel t""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', CAST(count(*) AS BIGINT),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           |  FROM $rel t""".stripMargin
      (numericCols.map(num) ++ stringCols.map(str))
        .mkString(" UNION ALL ")
    }
    s"""WITH pref AS (${prof(refRel)}), pcur AS (${prof(curRel)}),
       |j AS (SELECT pref."column" AS "column",
       |    pref.n_rows AS n_rows_ref, pcur.n_rows AS n_rows_cur,
       |    CASE WHEN pref.n_rows > 0
       |      THEN (pref.n_null * 1000000) // pref.n_rows
       |      END AS null_rate_ref_e6,
       |    CASE WHEN pcur.n_rows > 0
       |      THEN (pcur.n_null * 1000000) // pcur.n_rows
       |      END AS null_rate_cur_e6,
       |    pref.n_distinct AS nd_ref, pcur.n_distinct AS nd_cur,
       |    CASE WHEN pref.n_distinct > 0
       |      THEN (pcur.n_distinct * 1000000) // pref.n_distinct
       |      END AS distinct_ratio_e6,
       |    (pcur.min_num < pref.min_num OR pcur.max_num > pref.max_num)
       |      AS range_expanded
       |  FROM pref JOIN pcur ON pref."column" = pcur."column")
       |SELECT "column", n_rows_ref, n_rows_cur, null_rate_ref_e6,
       |  null_rate_cur_e6,
       |  null_rate_cur_e6 - null_rate_ref_e6 AS null_drift_e6,
       |  nd_ref, nd_cur, distinct_ratio_e6, range_expanded,
       |  (coalesce(abs(null_rate_cur_e6 - null_rate_ref_e6) > 10000,
       |     FALSE)
       |   OR coalesce(distinct_ratio_e6 < 500000, FALSE)
       |   OR coalesce(distinct_ratio_e6 > 2000000, FALSE)) AS drifted
       |FROM j ORDER BY "column"""".stripMargin.replace('\n', ' ')
  }

  /** Categorical drift gate — [[report]]'s fifth sibling and the
    * categorical counterpart of the numeric PSI: reference-vs-current
    * distribution of a category column compared by per-category
    * chi-square contribution. Both sides reduce to |categories|-row
    * count tables at scan speed; a category absent from the CURRENT
    * side still reports (expected > 0, observed 0 — the vanished-
    * category alarm), and a category absent from the REFERENCE yields
    * a NULL term rather than an ε fudge (no expected value exists).
    *
    * Determinism: expected counts and chi² terms are the same double
    * expressions of exact integer operands in both engines, rounded
    * to 6dp. */
  def categoricalDrift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    def cnt(df: DataFrame, out: String) =
      df.groupBy(col(catCol)).agg(count(lit(1)).as(out))
    val joined = cnt(ref, "n_ref")
      .join(cnt(cur, "n_cur"), Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    // tr > 0 guard: an empty reference window would otherwise make the
    // division NaN/Inf in Spark while DuckDB's ÷0 semantics differ —
    // the degenerate input yields NULLs in BOTH engines instead
    val exp = when(col("tr") > 0,
      col("n_ref").cast("double") / col("tr").cast("double") *
        col("tc").cast("double"))
    joined.crossJoin(broadcast(tot))
      .select(col(catCol), col("n_ref"), col("n_cur"),
        round(exp, 6).as("expected_cur"),
        when(col("n_ref") > 0, round(
          (col("n_cur").cast("double") - exp) *
            (col("n_cur").cast("double") - exp) / exp, 6))
          .as("chi2_term"))
  }

  /** Freshness gate — the fourth check next to the rules report, the
    * volume band, and referential integrity: per partition key (source,
    * event type, feed), the lag between a reference instant and the
    * partition's LATEST event, with a pass flag against `maxLagSeconds`.
    * The check that catches a silently-dead producer whose historical
    * volume still looks normal.
    *
    * `asOfMicros` is an explicit µs instant, not now(): deterministic,
    * replayable, and at 100 TB the "as of" is the orchestrator's run
    * logical time anyway. The as-of SHOULD be ≥ every event's
    * timestamp, but the contract is enforced rather than assumed: lag
    * is floored at 0 (so Spark's truncating `div` and DuckDB's
    * flooring `//` can never see a negative operand and diverge) and a
    * future-dated partition — max(ts) past the as-of — FAILS the gate
    * outright instead of silently reading fresh.
    *
    * Scale: ONE partial-aggregatable (key → max, count) pass at scan
    * speed; the report is |keys|-sized. */
  def freshness(df: DataFrame, keyCol: String, tsMicros: Column,
      asOfMicros: Long, maxLagSeconds: Long): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max(tsMicros).as("latest_us"), count(lit(1)).as("n_rows"))
      .withColumn("lag_s",
        expr(s"greatest(0, ($asOfMicros - latest_us) div 1000000)"))
      .select(col(keyCol), timestamp_micros(col("latest_us"))
          .as("latest_ts"),
        col("n_rows"), col("lag_s"),
        (col("lag_s") <= maxLagSeconds &&
          col("latest_us") <= asOfMicros).as("pass"))

  /** Functional-dependency / candidate-key profiler — the seventh
    * check (the schema-semantics sibling of [[profile]]): for each
    * asserted dependency LHS → RHS, does every LHS group determine
    * exactly one RHS value? Reports groups, violating groups (≥2
    * distinct RHS values), violating rows (all rows of a violating
    * group — the rows a repair would have to touch), and a pass flag.
    * With RHS = the LHS itself degenerate FDs double as uniqueness
    * checks; the interesting use is discovering which "keys" the data
    * actually honors before a merge/survivorship step trusts them.
    *
    * NULL RHS values ABSTAIN (count-distinct ignores them — the
    * survivorship convention, identical in DuckDB): a group holding
    * {NULL, 'a'} has one determined value, not a conflict.
    *
    * Scale: each dependency is one (lhs → distinct-rhs, count)
    * aggregate — the shuffle carries the partially-reduced
    * (lhs, rhs) grain, never raw rows — followed by a metadata-sized
    * rollup; the report is |deps| rows. Dependencies on the same
    * table still run as separate passes (different shuffle keys —
    * inherent, not a defect). */
  def functionalDependencies(
      deps: Seq[(String, DataFrame, Seq[String], String)]): DataFrame = {
    require(deps.nonEmpty, "at least one dependency required")
    deps.map { case (name, df, lhs, rhs) =>
      df.groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("nd"), count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when(col("nd") > 1, col("c")).otherwise(0L))
            .as("n_violating_rows"))
        .select(lit(name).as("rule"), col("n_groups"),
          col("n_violating_groups"),
          coalesce(col("n_violating_rows"), lit(0L))
            .as("n_violating_rows"),
          (col("n_violating_groups") === 0).as("pass"))
    }.reduce(_.unionByName(_))
  }

  /** Row-level QUARANTINE routing (dq8) — the transformation half of
    * the quality stack: where [[report]] COUNTS violations and io9's
    * write-audit-publish rejects whole batches, this splits the rows
    * themselves, tagging every failing row with the comma-joined list
    * of the rules it violates (in the caller's rule order) — the
    * dead-letter-queue payload a pipeline lands next to the clean
    * write so nothing is silently dropped and every quarantined row
    * is self-explaining.
    *
    * NULL rule results count as violations (the [[report]] contract:
    * a rule that cannot evaluate is not a pass). Pure per-row
    * expression work — scan speed, no shuffle, no state; adding a
    * rule adds a CASE arm, never a pass. */
  def quarantine(df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val tags = rules.map { case (name, cond) =>
      when(!coalesce(cond, lit(false)), lit(name))
    }
    df.withColumn("violated", concat_ws(",", tags: _*))
      .filter(col("violated") =!= "")
  }

  // ------------------------------------------------ two-sample KS (dq11)

  /** Two-sample Kolmogorov–Smirnov drift test (dq11) — the
    * distribution-SHAPE gate dq10's summary profile cannot see (a
    * mean-preserving variance change moves no null rate, no distinct
    * count, no extremum — KS catches it): D = max over x of
    * |F_ref(x) − F_cur(x)|, with the α=0.05 rejection rule
    * D > 1.358·√((n₁+n₂)/(n₁·n₂)).
    *
    * Scale design: each metric maps rows to an integral BIN (a
    * quantization grid — the grain is bounded by value-range ×
    * resolution, never by corpus size); all metrics ride ONE pass per
    * input via a row-local explode, then one (metric, bin) aggregate.
    * The CDF cumsum windows partition by metric over the bin grain —
    * bounded like the repo's day-grain rank-picks. Corpus-sized work:
    * exactly two scans, however many metrics.
    *
    * Determinism: counts are exact integers; D's numerator
    * d_num = max|cum₁·n₂ − cum₂·n₁| is an exact integer over the
    * common denominator n₁·n₂ (no per-step division); `d_e6` is one
    * truncating division of non-negative operands; the `drifted` gate
    * is the PURE-INTEGER squared form d_num²·10⁶ > 1844164·n₁n₂(n₁+n₂)
    * (1.358² = 1.844164 exactly) — the verdict never touches a double.
    * `crit_e6` (reporting only) is the x87-discipline double tree:
    * one IEEE sqrt/divide chain, identical in both engines, floored.
    * Products sit in DECIMAL(38,0)/HUGEINT; d_num² ≤ (n₁·n₂)² caps
    * n₁·n₂ near 10¹⁶ before the gate needs pre-scaled counts
    * (documented, the g22 bound family). */
  def ksTest(ref: DataFrame, cur: DataFrame,
      metrics: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def leg(df: DataFrame, src: Int) =
      df.select(explode(array(metrics.map { case (name, bin) =>
          struct(lit(name).as("metric"), bin.cast("long").as("bin"))
        }: _*)).as("mb"), lit(src).as("src"))
        .select(col("mb.metric").as("metric"), col("mb.bin").as("bin"),
          col("src"))
        .filter(col("bin").isNotNull)
    val binned = leg(ref, 0).unionAll(leg(cur, 1))
      .groupBy(col("metric"), col("bin"))
      .agg(sum(when(col("src") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("src") === 1, 1L).otherwise(0L)).as("c2"))
    val w = Window.partitionBy("metric").orderBy("bin")
    val wAll = Window.partitionBy("metric")
    binned
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .groupBy(col("metric"), col("n1"), col("n2"))
      .agg(max(abs(expr(
        "CAST(cum1 AS DECIMAL(38,0)) * n2 - CAST(cum2 AS DECIMAL(38,0)) * n1")))
        .as("dnum"))
      .select(col("metric"), col("n1").cast("long").as("n_ref"),
        col("n2").cast("long").as("n_cur"),
        expr("CAST((dnum * 1000000) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("d_e6"),
        expr("CAST(floor(1.358D * sqrt((CAST(n1 AS DOUBLE) + " +
          "CAST(n2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) * " +
          "CAST(n2 AS DOUBLE))) * 1000000D) AS BIGINT)").as("crit_e6"),
        expr("dnum * dnum * 1000000 > CAST(1844164 AS DECIMAL(38,0)) * " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2) * (CAST(n1 AS DECIMAL(38,0)) + n2)")
          .as("drifted"))
      .orderBy("metric")
  }

  /** DuckDB twin of [[ksTest]]; `metrics`: (name, binSqlExpr) where
    * the expression reads the relation's columns and yields the
    * integral bin. */
  def ksTestSql(refRel: String, curRel: String,
      metrics: Seq[(String, String)]): String = {
    def leg(rel: String, src: Int) = metrics.map { case (name, bin) =>
      s"SELECT '$name' AS metric, CAST($bin AS BIGINT) AS bin, " +
        s"$src AS src FROM $rel WHERE ($bin) IS NOT NULL"
    }.mkString(" UNION ALL ")
    s"""WITH rows_ AS (${leg(refRel, 0)} UNION ALL ${leg(curRel, 1)}),
       |b AS (SELECT metric, bin,
       |    sum(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS c1,
       |    sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS c2
       |  FROM rows_ GROUP BY 1, 2),
       |cum AS (SELECT metric,
       |    sum(c1) OVER (PARTITION BY metric ORDER BY bin) AS cum1,
       |    sum(c2) OVER (PARTITION BY metric ORDER BY bin) AS cum2,
       |    sum(c1) OVER (PARTITION BY metric) AS n1,
       |    sum(c2) OVER (PARTITION BY metric) AS n2
       |  FROM b),
       |d AS (SELECT metric, n1, n2,
       |    max(abs(CAST(cum1 AS HUGEINT) * n2 -
       |      CAST(cum2 AS HUGEINT) * n1)) AS dnum
       |  FROM cum GROUP BY 1, 2, 3)
       |SELECT metric, CAST(n1 AS BIGINT) AS n_ref,
       |  CAST(n2 AS BIGINT) AS n_cur,
       |  CAST((dnum * 1000000) // (CAST(n1 AS HUGEINT) * n2)
       |    AS BIGINT) AS d_e6,
       |  CAST(floor(CAST('1.358' AS DOUBLE) *
       |    sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) /
       |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) *
       |    CAST('1000000' AS DOUBLE)) AS BIGINT) AS crit_e6,
       |  dnum * dnum * 1000000 > CAST(1844164 AS HUGEINT) *
       |    (CAST(n1 AS HUGEINT) * n2) * (CAST(n1 AS HUGEINT) + n2)
       |    AS drifted
       |FROM d ORDER BY metric""".stripMargin.replace('\n', ' ')
  }
}
