package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{eventsTs, eventsUs, gold, table, withPipeline}
import graft.queries.ExtendedQueries.sessionize
import graft.text.TextAnalysis

/** Extended analytics operators, first half (x1–x50 plus the sketch
  * singletons bf/cms/qs/w): sessionization, pivot/unpivot, rollup/cube,
  * gap fill, outlier gates, attribution, clustering, windows.
  *
  * Mechanically split out of ExtendedQueries (round 8, VERDICT ask #8)
  * — query keys and bodies unchanged; [[ExtendedQueries]] aggregates
  * the family maps so the driver contract is untouched. */
object XAnalyticsCoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_sessionize" -> ((s, d) => {
      val ev = eventsTs(s, d)
      sessionize(ev)
        .orderBy("user_id", "session_seq")
    }),
    // groupBy().pivot(): avg standard value per country × pollutant
    "x2_pivot_param" -> ((s, d) => {
      val piv = PipelineQueries.silver(s, d)
        .groupBy(col("country"))
        .pivot("parameter", Seq("pm25", "pm10", "o3", "so2"))
        .agg(round(avg(col("value")), 4))
        .orderBy("country")
      piv
    }),
    // corpus vocabulary: top-20 tokens by document frequency
    "x3_vocab_top20" -> ((s, d) =>
      table(s, d, "documents")
        .select(explode(array_distinct(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text"))))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(desc("doc_freq"), col("tok"))
        .limit(20)),
    // per-label embedding centroids via posexplode → avg per dim →
    // reassemble (the k-means building block, fully distributed)
    "x4_label_centroids" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      emb
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("col").cast("double")).as("dim_avg"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_dims"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
              x => format_string("%.4f", x.getField("dim_avg")))
            , ",").as("centroid"))
        .orderBy("label")
    }),
    // SCD2 history build: each user's event_type change-log becomes
    // validity intervals (valid_from, valid_to, is_current) — the
    // change-data-capture → warehouse-dimension operator. One shuffle
    // (window by user); consecutive same-type rows collapse first so
    // intervals are maximal.
    "x11_scd2_intervals" -> ((s, d) =>
      graft.etl.Scd2.intervals(eventsTs(s, d),
        "user_id", "event_type", "ts")
        .orderBy("user_id", "valid_from")),
    // k-means assignment step: every embedding → nearest label centroid
    // (centroids from the x4 pipeline, 6-dp rounded for cross-engine
    // stability; tiny centroid table broadcasts, corpus never shuffles).
    // The argmax is max_by over the k scored rows: partial-aggregatable
    // (map-side reduces each vec's k rows to 1 before the shuffle), so
    // nothing ever sorts the corpus — the round-1 row_number window
    // shuffled and sorted all |corpus|·k rows and was the worst query in
    // the driver bench (37 s vs ~1 s-class). Tie-break matches the
    // oracle's (sim DESC, label ASC) via the (sim, -label) ordering key.
    "x10_centroid_assign" -> ((s, d) => {
      import graft.sim.Similarity
      val emb = table(s, d, "embeddings")
      val centroids = emb
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("dim_avg"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
          x => x.getField("dim_avg")).as("centroid"))
      val scored = emb
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("vec"))
        .join(broadcast(centroids))
        .withColumn("sim",
          round(Similarity.cosine(col("vec"), col("centroid")), 4))
      scored
        .groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("label"), col("sim")),
          struct(col("sim"), (-col("label")).as("neg_label"))).as("best"))
        .select(col("vec_id"), col("best.label").as("assigned_label"),
          col("best.sim").as("sim"))
        .orderBy("vec_id")
    }),
    // multi-level aggregation: ROLLUP (country, parameter) totals
    "x5_rollup" -> ((s, d) =>
      PipelineQueries.silver(s, d)
        .rollup(col("country"), col("parameter"))
        .agg(count(lit(1)).as("n_records"),
          round(avg(col("aqi")), 4).as("avg_aqi"))
        .select(
          coalesce(col("country"), lit("ALL")).as("country"),
          coalesce(col("parameter"), lit("ALL")).as("parameter"),
          col("n_records"), col("avg_aqi"))
        .orderBy("country", "parameter")),
    // CUBE (country, parameter): all 4 grouping combinations in one pass
    "x12_cube" -> ((s, d) =>
      PipelineQueries.silver(s, d)
        .cube(col("country"), col("parameter"))
        .agg(count(lit(1)).as("n_records"),
          round(avg(col("aqi")), 4).as("avg_aqi"))
        .select(
          coalesce(col("country"), lit("ALL")).as("country"),
          coalesce(col("parameter"), lit("ALL")).as("parameter"),
          col("n_records"), col("avg_aqi"))
        .orderBy("country", "parameter")),
    // ranking functions: dense_rank + ntile of stations within country
    "x6_rank_stations" -> ((s, d) => {
      val perStation = PipelineQueries.silver(s, d)
        .groupBy(col("country"), col("location_id"))
        .agg(round(avg(col("aqi")), 4).as("avg_aqi"))
      val w = Window.partitionBy(col("country"))
        .orderBy(desc("avg_aqi"), col("location_id"))
      perStation
        .withColumn("rnk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .orderBy("country", "rnk", "location_id")
    }),
    // set operations: INTERSECT / EXCEPT over customer key sets
    "x7_setops" -> ((s, d) => {
      val building = table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withF = table(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      building.intersect(withF).withColumn("tag", lit("both"))
        .unionAll(
          building.except(withF).withColumn("tag", lit("only_building")))
        .orderBy("tag", "custkey")
    }),
    // exact percentiles (linear interpolation — same rule as DuckDB's
    // quantile_cont); at 100 TB swap for approx_percentile
    "x8_percentiles" -> ((s, d) =>
      PipelineQueries.silver(s, d)
        .groupBy(col("parameter"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy("parameter")),
    // semi-structured extraction: the raw JSON props column parsed with
    // a declared schema (from_json — codegen'd, no UDF, malformed rows
    // null out instead of failing) and aggregated. The schema'd parse
    // is the 100 TB answer: schemaless get_json_object re-parses per
    // field, from_json parses once per row
    "x34_json_props" -> ((s, d) =>
      table(s, d, "events")
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),
    // per-group z-score tail detection from decimal-exact moments: ONE
    // aggregate per event_type computes n / Σv / Σv² in DECIMAL (bit-
    // reproducible regardless of partial-sum order — the ml2 Gram
    // pattern), doubles enter only in the identical mean/std/z
    // expressions both engines evaluate on those exact sums
    "x40_zscore_outliers" -> ((s, d) => {
      val v = col("value").cast("decimal(18,6)")
      val stats = table(s, d, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type").as("s_type"))
        .agg(count(lit(1)).as("n"), sum(v).as("sum_d"),
          sum(v * v).as("sumsq_d"))
        .withColumn("mean", col("sum_d").cast("double") / col("n"))
        .withColumn("std", sqrt(
          (col("sumsq_d").cast("double") -
            col("sum_d").cast("double") * col("sum_d").cast("double") /
              col("n")) / (col("n") - 1)))
        .select(col("s_type"), col("mean"), col("std"))
      table(s, d, "events")
        .filter(col("value").isNotNull)
        .join(broadcast(stats), col("event_type") === col("s_type"))
        .withColumn("z",
          round((col("value") - col("mean")) / col("std"), 4))
        .filter(abs(col("z")) >= 1.5)
        .select(col("event_id"), col("event_type"), col("value"),
          col("z"))
        .orderBy("event_id")
    }),
    // deterministic per-group mode: count per (user, type) reuses the
    // group shuffle, then min_by((-cnt, type)) — max count with an
    // alphabetic tie-break, partial-aggregatable, no window. Spark's
    // builtin mode() is tie-nondeterministic; this one hash-matches a
    // SQL oracle
    "x30_mode_per_group" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(min_by(
          struct(col("event_type"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_type").as("mode_type"),
          col("m.cnt").as("n_occurrences"))
        .orderBy("user_id")),
    // incremental aggregate maintenance: per-key partials from two
    // ingest batches MERGE (sum-of-counts, sum-of-sums, min-of-mins,
    // max-of-maxes) instead of recomputing over all data — the
    // materialized-view refresh algebra. The oracle recomputes from
    // scratch; equality IS the correctness claim. Decimal sums so the
    // merge is order-exact
    "x31_incremental_agg" -> ((s, d) => {
      val ev = eventsTs(s, d)
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      def partial(df: DataFrame) = df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).as("sv"),
          min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      partial(ev.filter(col("ts") < cutoff))
        .unionByName(partial(ev.filter(col("ts") >= cutoff)))
        .groupBy(col("user_id"))
        .agg(sum(col("cnt")).as("n_events"),
          sum(col("sv")).cast("double").as("sum_value"),
          min(col("mn")).as("first_ts"), max(col("mx")).as("last_ts"))
        .orderBy("user_id")
    }),
    // time-series gap fill: per-station hourly spine (sequence over the
    // station's own [min, max] hours — a per-key bounds aggregate plus
    // a row-local explode, no cross-key data motion) left-joined to the
    // observed hours, then last-observation-carried-forward via one
    // keyed window. The resample/LOCF primitive every sensor pipeline
    // needs; at 100 TB bound the spine (dormant keys explode it) and
    // partition the write by time
    "x29_gap_fill" -> ((s, d) => {
      val g = gold(s, d)
        .select(col("location_id"), col("datetime"), col("aqi"))
      val bounds = g.groupBy(col("location_id"))
        .agg(min(col("datetime")).as("mn"), max(col("datetime")).as("mx"))
      val spine = bounds.select(col("location_id"),
        explode(expr("sequence(mn, mx, interval 1 hour)")).as("datetime"))
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(g, Seq("location_id", "datetime"), "left")
        .withColumn("aqi_filled",
          last(col("aqi"), ignoreNulls = true).over(w))
        .withColumn("was_gap", col("aqi").isNull)
        .select(col("location_id"), col("datetime"), col("aqi_filled"),
          col("was_gap"))
        .orderBy("location_id", "datetime")
    }),
    // explicit GROUPING SETS with grouping_id — the third grouping
    // construct next to rollup (x5) and cube (x12): only the requested
    // combinations compute, one expand + one aggregate
    "x28_grouping_sets" -> ((s, d) => {
      PipelineQueries.silver(s, d)
        .createOrReplaceTempView("graft_silver_gs")
      // gid spelled as explicit grouping() arithmetic — the same
      // expression the DuckDB twin uses (grouping_id() encodings are
      // engine-specific)
      s.sql(
        """SELECT country, parameter,
          |  CAST(grouping(country) * 2 + grouping(parameter) AS BIGINT)
          |    AS gid,
          |  count(*) AS n_records, round(avg(aqi), 4) AS avg_aqi
          |FROM graft_silver_gs
          |GROUP BY GROUPING SETS ((country), (parameter), ())
          |ORDER BY gid, country, parameter""".stripMargin)
    }),
    // market-basket association rules over co-ordered parts: support /
    // confidence / lift from three integer-exact aggregates (order-item
    // distinct pairs, item supports, order total); lift's double-cast
    // operands multiply in the same order in both engines and the
    // top-25 cut is TakeOrderedAndProject under (lift DESC, p1, p2)
    "x41_association_rules" -> ((s, d) => {
      val lp = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = lp.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val item = lp.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_item"))
      val pairs = lp.alias("a")
        .join(lp.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 2)
      pairs
        .join(item.select(col("l_partkey").as("p1"),
          col("n_item").as("n_p1")), "p1")
        .join(item.select(col("l_partkey").as("p2"),
          col("n_item").as("n_p2")), "p2")
        .crossJoin(broadcast(n))
        .withColumn("confidence",
          col("n_both").cast("double") / col("n_p1").cast("double"))
        .withColumn("lift",
          col("n_both").cast("double") * col("n_orders").cast("double") /
            (col("n_p1").cast("double") * col("n_p2").cast("double")))
        .select(col("p1"), col("p2"), col("n_both"), col("n_p1"),
          col("n_p2"), col("confidence"), col("lift"))
        .orderBy(desc("lift"), col("p1"), col("p2")).limit(25)
    }),
    // robust per-group outlier detection via exact medians: lower
    // median (rank (n+1) div 2 picks a stored double — no
    // interpolation, the w8/w10 convention) of value, then of the
    // absolute deviations (MAD); a row is an outlier when dev > 3·MAD.
    // All comparisons are exact ops on identical stored doubles, so no
    // rounding convention is needed anywhere. Each median is one
    // per-group median by rank-pick — two-phase keyedCumsum rank (the
    // w8 shape), never a |types|-task window over the event grain
    "x42_mad_outliers" -> ((s, d) => {
      val ev = table(s, d, "events")
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value"))
      def lowerMedian(df: DataFrame, c: String, out: String) = {
        val counts = df.groupBy(col("event_type").as("n_type"))
          .agg(count(lit(1)).as("n"))
        graft.etl.Ids.keyedCumsum(df.withColumn("__one", lit(1L)),
            "event_type", Seq(c, "event_id"), "__one", "rn")
          .join(broadcast(counts), col("event_type") === col("n_type"))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("event_type").as("m_type"), col(c).as(out))
      }
      val med = lowerMedian(ev, "value", "med")
      // two consumers (the MAD rank-pick and the final outlier filter)
      // read the event-grain deviation frame; materialize it once
      // (guide §1.2) instead of re-scanning events + re-joining the
      // medians for each
      val withDev = ev
        .join(broadcast(med), col("event_type") === col("m_type"))
        .drop("m_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .localCheckpoint()
      val mad = lowerMedian(withDev, "dev", "mad")
      withDev
        .join(broadcast(mad), col("event_type") === col("m_type"))
        .filter(col("dev") > lit(3.0) * col("mad"))
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"))
        .orderBy("event_id")
    }),
    // 2-D Pareto frontier (skyline): cheapest-price / largest-size
    // non-dominated part points. Scale shape: reduce to the distinct
    // (price, size) grain, keep only each price's max size (anything
    // else is dominated at the same price), THEN one global running-max
    // window over ≤|distinct prices| rows — never a window over the
    // data. The oracle is the independent NOT EXISTS dominance
    // formulation, so the window rewrite itself is what's checked
    "x44_skyline" -> ((s, d) => {
      val pts = table(s, d, "part")
        .groupBy(col("p_retailprice").as("price"),
          col("p_size").as("size"))
        .agg(count(lit(1)).as("n_parts"))
      val perPrice = pts.groupBy(col("price"))
        .agg(max_by(struct(col("size"), col("n_parts")),
          col("size")).as("m"))
        .select(col("price"), col("m.size").as("size"),
          col("m.n_parts").as("n_parts"))
      val w = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perPrice
        .withColumn("run_max", max(col("size")).over(w))
        .filter(col("run_max").isNull || col("run_max") < col("size"))
        .select(col("price"), col("size"), col("n_parts"))
        .orderBy("price")
    }),
    // running distinct-user curve per event type: first-seen day from a
    // (type, user) min-aggregate — NOT a first-occurrence window over
    // every event — joined onto the daily event counts, cumulative sum
    // over the per-type day series (≤ |days| rows per type). The
    // classic "DAU vs cumulative uniques" growth query, windowless on
    // the big table
    "w11_running_distinct" -> ((s, d) => {
      val ev = eventsTs(s, d)
      val daily = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val firstSeen = ev
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .groupBy(col("event_type"),
          date_trunc("day", col("first_ts")).as("day"))
        .agg(count(lit(1)).as("new_users"))
      daily
        .join(firstSeen, Seq("event_type", "day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_distinct_users",
          sum(col("new_users")).over(Window
            .partitionBy(col("event_type")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_type"), col("day"), col("n_events"),
          col("new_users"), col("cum_distinct_users"))
        .orderBy(col("event_type"), col("day"))
    }),
    // share-of-parent ratios (the ratio_to_report OLAP op): nation
    // revenue as a share of its region and of the grand total — the
    // two windows run over the 25-row nation aggregate, never the
    // facts; every share divides the same exact DECIMAL-cast sums
    "x50_revenue_share" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = table(s, d, "orders")
        .join(table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_d"))
      rev
        .withColumn("region_d",
          sum(col("rev_d")).over(Window.partitionBy(col("r_name"))))
        .withColumn("total_d",
          sum(col("rev_d")).over(Window.partitionBy()))
        .select(col("r_name"), col("n_name"), col("n_orders"),
          col("rev_d").cast("double").as("revenue"),
          (col("rev_d").cast("double") / col("region_d").cast("double"))
            .as("share_of_region"),
          (col("rev_d").cast("double") / col("total_d").cast("double"))
            .as("share_of_total"))
        .orderBy("r_name", "n_name")
    }),
    // per-user maximum drawdown over the event-value series: running
    // peak via a cumulative-max window, drawdown (peak−v)/peak per row
    // — every quotient is a deterministic double of identical stored
    // operands, so the per-user max needs no rounding convention
    "w13_max_drawdown" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      eventsUs(s, d)
        .filter(col("value").isNotNull)
        .withColumn("peak", max(col("value")).over(w))
        .withColumn("dd", (col("peak") - col("value")) / col("peak"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("peak")).as("peak_value"),
          max(col("dd")).as("max_drawdown"))
        .orderBy("user_id")
    }),
    // time-weighted average value per user (TWAP): segment durations
    // from consecutive event gaps (µs-integer lead, floored to whole
    // seconds — sub-second segments carry no weight by contract),
    // value·duration terms rounded then DECIMAL-summed, one division
    // of the two exact aggregates at the end
    "x49_twap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      eventsUs(s, d)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("us"), col("event_id"), col("value"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dur_s", expr("(next_us - us) div 1000000"))
        .filter(col("dur_s") >= 1)
        .withColumn("term",
          round(col("value") * col("dur_s").cast("double"), 6)
            .cast("decimal(28,6)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur_s")).as("total_s"),
          sum(col("term")).as("num_d"))
        .select(col("user_id"), col("n_segments"), col("total_s"),
          (col("num_d").cast("double") / col("total_s").cast("double"))
            .as("twap"))
        .orderBy("user_id")
    }),
    // multi-touch linear attribution: each purchase's value splits
    // equally across the user's clicks in the preceding 7 days, credit
    // aggregated per user. The touch match is a user-keyed equi-join
    // with a µs-integer range predicate (the as-of join shape, exact
    // in both engines); v/n is a double/bigint division of identical
    // operands, rounded then DECIMAL-summed
    "x45_linear_attribution" -> ((s, d) => {
      val ev = eventsUs(s, d)
      val purch = ev.filter(col("event_type") === "purchase" &&
          col("value").isNotNull)
        .select(col("user_id"), col("event_id").as("p_id"),
          col("us").as("p_us"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("us").as("c_us"))
      val win = 7L * 86400L * 1000000L
      val credited = purch.join(clicks, Seq("user_id"))
        .filter(col("c_us") <= col("p_us") &&
          col("p_us") - col("c_us") <= win)
        .groupBy(col("user_id"), col("p_id"), col("value"))
        .agg(count(lit(1)).as("n_touches"))
        .withColumn("credit",
          round(col("value") / col("n_touches"), 6)
            .cast("decimal(18,6)"))
      credited.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_attributed_purchases"),
          sum(col("n_touches")).as("n_touches"),
          sum(col("credit")).cast("double").as("attributed_value"))
        .orderBy("user_id")
    }),
    // distributed contiguous id assignment: range-partition + parallel
    // per-partition ranks + broadcast offsets — never a single-partition
    // row_number over the data (graft.etl.Ids)
    "x18_global_ids" -> ((s, d) =>
      graft.etl.Ids.withOrderedIds(
        table(s, d, "documents"), orderCol = "doc_id")
        .select(col("doc_id"), col("assigned_id"), col("lang"),
          col("source"))
        .orderBy("doc_id")),
    // CDC upsert (MERGE): base window collapses to a per-user snapshot,
    // then the post-cutoff changelog upserts into it — both steps are the
    // same max_by collapse (graft.etl.Cdc), no window over the data
    "x15_cdc_upsert" -> ((s, d) => {
      import graft.etl.Cdc
      val ev = eventsTs(s, d)
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val cols = (Seq("user_id"), Seq("event_type", "value"),
        Seq("ts", "event_id"))
      val snapshot = Cdc.compactLatest(ev.filter(col("ts") < cutoff),
        cols._1, cols._2, cols._3)
      Cdc.upsertLatest(snapshot, ev.filter(col("ts") >= cutoff),
        cols._1, cols._2, cols._3)
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("ts").as("last_ts"),
          col("event_id").as("last_event_id"),
          (col("ts") >= cutoff).as("was_updated"))
        .orderBy("user_id")
    }),
    // MERGE with DELETE semantics: 'error' events are tombstones — the
    // snapshot is the live pre-cutoff state, the changelog both upserts
    // and deletes; a key whose latest op is a tombstone disappears, a
    // later upsert re-inserts it. Same single max_by collapse as x15,
    // the tombstone applies as a |keys|-sized post-filter
    "x27_merge_tombstones" -> ((s, d) => {
      import graft.etl.Cdc
      val ev = eventsTs(s, d)
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val cols = (Seq("user_id"), Seq("event_type", "value"),
        Seq("ts", "event_id"))
      val isDelete = col("event_type") === "error"
      // live pre-cutoff state: tombstoned keys already removed
      val snapshot = Cdc.mergeWithTombstones(
        ev.limit(0), ev.filter(col("ts") < cutoff),
        cols._1, cols._2, cols._3, isDelete)
      Cdc.mergeWithTombstones(snapshot, ev.filter(col("ts") >= cutoff),
        cols._1, cols._2, cols._3, isDelete)
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("ts").as("last_ts"),
          col("event_id").as("last_event_id"))
        .orderBy("user_id")
    }),
    // per-user event-sequence bigrams (Markov transition counts — the
    // sequence-model / user-journey prep): one window lag ordered by
    // (ts, event_id) inside each user partition, then a metadata-sized
    // aggregate; transition probabilities are integer basis points over
    // the aggregated (|types|² row) table, never over the data
    "x26_event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val counts = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n_transitions"))
      counts
        .withColumn("prob_bps",
          expr("(n_transitions * 10000) div " +
            "nullif(sum(n_transitions) over " +
            "(partition by prev_type), 0)"))
        .orderBy("prev_type", "next_type")
    }),
    // first-touch funnel (view → click → purchase) through the shared
    // ONE-PASS path (analytics.Funnel.firstTouchFlags): a single events
    // scan, one conditional min per stage in one user-keyed aggregate,
    // stage flags row-local; conversion ratios are exact integer basis
    // points (a 4-dp float pct can land on a rounding tie). The plan
    // shape (1 scan, 2 exchanges) is pinned in PlanShapeSpec
    "x23_funnel" -> ((s, d) => {
      val perUser = graft.analytics.Funnel.firstTouchFlags(
        eventsTs(s, d), "event_type", "user_id", "ts",
        Seq("view", "click", "purchase"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("s_1"), 1L).otherwise(0L)).as("n_view"),
        sum(when(col("s_2"), 1L).otherwise(0L)).as("n_click_after_view"),
        sum(when(col("s_3"), 1L).otherwise(0L))
          .as("n_purchase_after_click"))
        .select(col("n_users"), col("n_view"), col("n_click_after_view"),
          col("n_purchase_after_click"),
          expr("(n_view * 10000) div nullif(n_users, 0)").as("view_bps"),
          expr("(n_click_after_view * 10000) div nullif(n_users, 0)")
            .as("click_bps"),
          expr("(n_purchase_after_click * 10000) div nullif(n_users, 0)")
            .as("purchase_bps"))
    }),
    // weekly cohort retention: cohort = signup week, activity = any
    // event's week; one distinct + one join keyed by user + one
    // metadata-sized aggregate — the standard growth-analytics matrix
    "x24_cohort_retention" -> ((s, d) => {
      val ev = eventsTs(s, d)
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date")
          .as("cohort_week"))
      val activity = ev
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("act_week"))
        .distinct()
      signup.join(activity, "user_id")
        .filter(col("act_week") >= col("cohort_week"))
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(act_week, cohort_week) div 7").cast("int")
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),
    // exact top-3 events per user via the typed TopK Aggregator —
    // bounded per-group state with map-side partials (only |groups|·k
    // rows shuffle), vs a window that sorts every row of every group
    // count-min sketch heavy hitters: the FIXED-state frequency sketch
    // next to a3's HLL (distinct) — estimates are deterministic integer
    // sums (partition-order-free), always >= the exact count, and
    // rows-only here (DuckDB has no CMS; error bound + merge identity
    // are asserted in CountMinSpec). The sketch build is the distributed
    // cost; the two driver-side reads are metadata-sized by construction
    // (the 4x256 sketch row, the |event_types| exact-count table).
    // ENGINE-PORTABLE HLL (a3p): per event_type, distinct-user
    // estimate with md5-hashed registers — the sketch STATE (occupied
    // registers + Σ2^(43−ρ) as an exact BIGINT) and the raw α·m²/ΣZ
    // estimate (exact integral division, 0.01 units) all replay in
    // DuckDB; a3's Spark-native HLL++ stays the production path
    "a3p_hll_portable" -> ((s, d) =>
      graft.analytics.PortableSketch.hllDistinct(
        PipelineQueries.table(s, d, "events"), "event_type", "user_id")
        .orderBy("event_type")),
    // ENGINE-PORTABLE count-min (cms1p): the cms1 algorithm under
    // md5 row hashes — both engines fill the identical 4×256 table
    // and take the same min-of-home-cells point estimates;
    // est_n ≥ exact_n (the CM guarantee) is pinned in spec
    "cms1p_portable" -> ((s, d) =>
      graft.analytics.PortableSketch.cmsEstimates(
        PipelineQueries.table(s, d, "events"), "event_type")
        .orderBy("event_type")),
    // ENGINE-PORTABLE Bloom (bf1p): bf1's urgent-orders→lineitem
    // pruning filter with md5 positions and the filter AS a
    // distinct-position set — both engines set the same bits, probe
    // the same keys, and count the same false positives; pass ⊇
    // exact is spec-pinned. bf1 (codegen'd BloomMightContain over
    // xxhash words) stays the production path
    "bf1p_bloom_portable" -> ((s, d) =>
      graft.analytics.PortableSketch.bloomStats(
        PipelineQueries.table(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"), "o_orderkey",
        PipelineQueries.table(s, d, "lineitem"), "l_orderkey")),
    "cms1_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      import graft.agg.CountMin
      val (dRows, wCols) = (4, 256)
      val hashed = table(s, d, "events")
        .select(xxhash64(col("event_type")).as("h")).as[Long]
      val sketch = hashed
        .select(new CountMin(dRows, wCols).toColumn.name("sk")).head()
      val exact = table(s, d, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
        .withColumn("h", xxhash64(col("event_type")))
        .collect()
      exact
        .map { r =>
          (r.getString(0), r.getAs[Long]("exact_n"),
            CountMin.estimate(sketch, r.getAs[Long]("h"), dRows, wCols))
        }
        .sortBy(_._1).toSeq
        .toDF("event_type", "exact_n", "cms_estimate")
    }),
    // library-level Bloom semi-join pruning: ONE partial-agg pass
    // builds a 16 Kbit filter over the urgent orders' keys (state
    // merges by OR on any partitioning), then every lineitem row is
    // probed INSIDE the scan's codegen span by the native
    // BloomMightContain expression — the filter rides along as an
    // array<bigint> literal, the broadcast shape. Scored against the
    // exact match flag: bloom_pass ≥ exact always (no false
    // negatives), the gap is the measured fp cost. Rows-only like
    // cms1 (xxhash64 state is irreproducible in DuckDB); the
    // no-false-negative and fp-bound claims are BloomSpec's
    "bf1_bloom_prune" -> ((s, d) => {
      import s.implicits._
      import graft.agg.BloomFilter
      val numHashes = 5
      val urgent = table(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val bloom = urgent
        .select(xxhash64(col("o_orderkey")).as("h")).as[Long]
        .select(new BloomFilter(1 << 14, numHashes).toColumn.name("bf"))
        .head()
      table(s, d, "lineitem")
        .withColumn("bloom_pass",
          graft.expr.BloomExprs.bloomMightContain(
            xxhash64(col("l_orderkey")), typedLit(bloom),
            lit(numHashes)))
        .join(urgent.select(col("o_orderkey"), lit(1L).as("is_urgent")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("bloom_pass").cast("long")).as("n_bloom_pass"),
          sum(coalesce(col("is_urgent"), lit(0L))).as("n_exact"))
        .orderBy("l_returnflag")
    }),
    "x22_topk_per_group" -> ((s, d) => {
      import s.implicits._
      import graft.agg.{TopItem, TopK}
      val items = table(s, d, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("value"), col("event_id"))
        .as[(Long, Double, Long)]
      items.groupByKey(_._1)
        .mapValues { case (_, v, id) => TopItem(v, id) }
        .agg(new TopK(3).toColumn.name("top"))
        .toDF("user_id", "top")
        .select(col("user_id"), posexplode(col("top")))
        .select(col("user_id"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.value").as("value"), col("col.id").as("event_id"))
        .orderBy("user_id", "rnk")
    }),
    // hash-bottom-k QUANTILE SKETCH (KMV sampling), completing the
    // sketch family next to bf1 (membership) and cms1 (frequency):
    // keep each group's 64 rows with the smallest 48-bit md5(event_id)
    // prefix. Min-of-hashes is commutative/associative, so unlike
    // GK/t-digest state the sample — and therefore the estimate — is
    // merge-order independent: reproducible across partitionings AND
    // rebuildable by a SQL oracle. The kept set rides the x22 TopK
    // aggregator (bounded 64-item state per group, map-side combine —
    // only |groups|·64 ids move), values come back via a sample-sized
    // broadcast join, and each quantile is a rank-pick of a stored
    // double inside the sample (no interpolation — the w8/w10
    // convention). Accuracy is the KMV bound (~1/√k quantile units),
    // pinned in SketchQuantileSpec; exactness of the sample is pinned
    // by the oracle.
    "qs1_quantile_sketch" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.agg.{TopItem, TopK}
      val ev = table(s, d, "events").filter(col("value").isNotNull)
      val hashed = ev.select(col("event_type"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), " +
            "1, 12), 16, 10) AS BIGINT)").as("h"),
          col("event_id"))
        .as[(String, Long, Long)]
      val sample = hashed.groupByKey(_._1)
        .mapValues { case (_, h, id) => TopItem(-h.toDouble, id) }
        .agg(new TopK(64).toColumn.name("keep"))
        .toDF("s_type", "keep")
        .select(col("s_type"), explode(col("keep")).as("item"))
        .select(col("item.id").as("s_id"))
      val samp = ev
        .select(col("event_type"), col("event_id"), col("value"))
        .join(broadcast(sample), col("event_id") === col("s_id"))
      val byType = Window.partitionBy(col("event_type"))
      val ranked = samp
        .withColumn("rn",
          row_number().over(byType.orderBy(col("value"), col("event_id"))))
        .withColumn("ns", count(lit(1)).over(byType))
      def pick(bp: Int) = max(when(
        col("rn") === expr(s"greatest(1, (ns * $bp + 9999) div 10000)"),
        col("value")))
      ranked.groupBy(col("event_type"))
        .agg(max(col("ns")).as("n_sample"),
          pick(2500).as("q25"), pick(5000).as("q50"),
          pick(7500).as("q75"), pick(9000).as("q90"))
        .orderBy("event_type")
    }),
    // snapshot diff → changelog: the INVERSE of the x15 CDC apply —
    // derive insert/update/delete/unchanged rows from two immutable
    // per-key snapshots (how a plain-parquet lake emits a CDC feed).
    // One full-outer hash join on the key; payload compare is row-local
    // and null-safe (<=>); each snapshot is the x15 max_by collapse
    "x21_snapshot_diff" -> ((s, d) => {
      import graft.etl.Cdc
      val ev = eventsTs(s, d)
      def snap(lo: String, hi: String) = Cdc.compactLatest(
        ev.filter(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp")),
        Seq("user_id"), Seq("event_type", "value"), Seq("ts", "event_id"))
      val a = snap("2024-01-01 00:00:00", "2024-01-12 00:00:00")
        .select(col("user_id"), col("event_type").as("old_type"),
          col("value").as("old_value"))
      val b = snap("2024-01-08 00:00:00", "2024-01-20 00:00:00")
        .select(col("user_id").as("uid_b"),
          col("event_type").as("new_type"), col("value").as("new_value"))
      a.join(b, col("user_id") === col("uid_b"), "full_outer")
        .select(
          coalesce(col("user_id"), col("uid_b")).as("user_id"),
          when(col("user_id").isNull, "insert")
            .when(col("uid_b").isNull, "delete")
            .when(col("old_type") <=> col("new_type") &&
              col("old_value") <=> col("new_value"), "unchanged")
            .otherwise("update").as("change_type"),
          col("old_type"), col("old_value"), col("new_type"),
          col("new_value"))
        .orderBy("user_id")
    }),
    // the remaining ANSI window-function suite (ntile / percent_rank /
    // cume_dist / first_value / running max) over per-customer order
    // histories — one shuffle shared by all five functions (same window
    // spec), partitions are customer-sized so parallelism scales with
    // key count, not data size. Ratios stay unrounded: identical integer
    // operands divide to identical doubles on both engines
    "x20_window_suite" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("p_rank"),
          cume_dist().over(w).as("c_dist"),
          first_value(col("o_totalprice")).over(wAll).as("first_price"),
          max(col("o_totalprice")).over(wAll).as("running_max"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "a3p_hll_portable" -> graft.analytics.PortableSketch
      .hllDistinctSql("events", "event_type", "user_id"),
    "cms1p_portable" -> graft.analytics.PortableSketch
      .cmsEstimatesSql("events", "event_type"),
    "bf1p_bloom_portable" -> graft.analytics.PortableSketch
      .bloomStatsSql(
        "(SELECT o_orderkey FROM orders " +
          "WHERE o_orderpriority = '1-URGENT')", "o_orderkey",
        "lineitem", "l_orderkey"),
    "x1_sessionize" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  round(CAST(sum(value) AS DOUBLE), 4) AS session_value
        |FROM sessions GROUP BY 1, 2
        |ORDER BY user_id, session_seq""".stripMargin.replace('\n', ' '),
    "x2_pivot_param" -> withPipeline(
      """SELECT country,
        |  round(avg(value) FILTER (WHERE parameter = 'pm25'), 4) AS pm25,
        |  round(avg(value) FILTER (WHERE parameter = 'pm10'), 4) AS pm10,
        |  round(avg(value) FILTER (WHERE parameter = 'o3'), 4) AS o3,
        |  round(avg(value) FILTER (WHERE parameter = 'so2'), 4) AS so2
        |FROM silver GROUP BY country
        |ORDER BY country""".stripMargin.replace('\n', ' ')),
    "x3_vocab_top20" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""SELECT tok, count(*) AS doc_freq FROM (
         |  SELECT unnest(list_distinct(
         |    regexp_split_to_array($norm, '\\s+'))) AS tok
         |  FROM documents)
         |GROUP BY tok ORDER BY doc_freq DESC, tok
         |LIMIT 20""".stripMargin.replace('\n', ' ')
    },
    "x4_label_centroids" ->
      """WITH exploded AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, pos, avg(CAST(val AS DOUBLE)) AS dim_avg
        |  FROM exploded GROUP BY 1, 2)
        |SELECT label, count(*) AS n_dims,
        |  array_to_string(list(printf('%.4f', dim_avg) ORDER BY pos), ',')
        |    AS centroid
        |FROM dims GROUP BY label
        |ORDER BY label""".stripMargin.replace('\n', ' '),
    "x11_scd2_intervals" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |changes AS (
        |  SELECT user_id, event_type, ts,
        |    lag(event_type, 1) OVER w AS prev_type
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts, 1) OVER w2 AS valid_to,
        |  lead(ts, 1) OVER w2 IS NULL AS is_current
        |FROM changes
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)
        |ORDER BY user_id, valid_from""".stripMargin.replace('\n', ' '),
    "x10_centroid_assign" ->
      """WITH exploded AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6) AS dim_avg
        |  FROM exploded GROUP BY 1, 2),
        |cents AS (
        |  SELECT label, list(dim_avg ORDER BY pos) AS centroid
        |  FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, c.label,
        |    round(list_cosine_similarity(
        |      CAST(e.embedding AS DOUBLE[]), c.centroid), 4) AS sim
        |  FROM embeddings e, cents c)
        |SELECT vec_id, label AS assigned_label, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, label) AS rnk FROM scored)
        |WHERE rnk = 1 ORDER BY vec_id""".stripMargin.replace('\n', ' '),
    "x5_rollup" -> withPipeline(
      """SELECT coalesce(country, 'ALL') AS country,
        |  coalesce(parameter, 'ALL') AS parameter,
        |  count(*) AS n_records, round(avg(aqi), 4) AS avg_aqi
        |FROM silver GROUP BY ROLLUP (country, parameter)
        |ORDER BY country, parameter""".stripMargin.replace('\n', ' ')),
    "x12_cube" -> withPipeline(
      """SELECT coalesce(country, 'ALL') AS country,
        |  coalesce(parameter, 'ALL') AS parameter,
        |  count(*) AS n_records, round(avg(aqi), 4) AS avg_aqi
        |FROM silver GROUP BY CUBE (country, parameter)
        |ORDER BY country, parameter""".stripMargin.replace('\n', ' ')),
    "x6_rank_stations" -> withPipeline(
      """SELECT country, location_id, avg_aqi,
        |  CAST(dense_rank() OVER w AS INT) AS rnk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM (SELECT country, location_id, round(avg(aqi), 4) AS avg_aqi
        |  FROM silver GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY country
        |  ORDER BY avg_aqi DESC, location_id)
        |ORDER BY country, rnk, location_id""".stripMargin.replace('\n', ' ')),
    "x7_setops" ->
      """SELECT custkey, 'both' AS tag FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |    WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT custkey, 'only_building' AS tag FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |    WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY tag, custkey""".stripMargin.replace('\n', ' '),
    "x8_percentiles" -> withPipeline(
      """SELECT parameter,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM silver GROUP BY parameter
        |ORDER BY parameter""".stripMargin.replace('\n', ' ')),
    "x18_global_ids" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) AS assigned_id,
        |  lang, source
        |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' '),
    // snapshot ∪ changelog → latest per key ≡ latest overall; row_number
    // is the oracle's formulation, max_by the engine's
    "x15_cdc_upsert" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |latest AS (
        |  SELECT user_id, event_type AS last_type, value AS last_value,
        |    ts AS last_ts, event_id AS last_event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT user_id, last_type, last_value, last_ts, last_event_id,
        |  last_ts >= TIMESTAMP '2024-01-21 00:00:00' AS was_updated
        |FROM latest WHERE rn = 1
        |ORDER BY user_id""".stripMargin.replace('\n', ' '),
    // json_valid + TRY_CAST mirror Spark's null-out-on-malformed
    // from_json semantics: bare json_extract RAISES on malformed JSON,
    // so a single dirty props value would error the oracle while the
    // engine succeeds
    "x34_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |    CASE WHEN json_valid(props)
        |      THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events)
        |GROUP BY 1 ORDER BY event_type""".stripMargin.replace('\n', ' '),
    // the oracle rebuilds the identical KMV sample (bottom-64 by md5
    // prefix) with a window — correct but sort-heavy; the engine side
    // uses the bounded-state aggregator instead
    "qs1_quantile_sketch" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value,
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
        |      ::BIGINT AS h
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY h, event_id) AS hr
        |  FROM ev),
        |samp AS (SELECT event_type, event_id, value FROM s
        |  WHERE hr <= 64),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS ns
        |  FROM samp)
        |SELECT event_type, CAST(max(ns) AS BIGINT) AS n_sample,
        |  max(CASE WHEN rn = greatest(1, (ns * 2500 + 9999) // 10000)
        |    THEN value END) AS q25,
        |  max(CASE WHEN rn = greatest(1, (ns * 5000 + 9999) // 10000)
        |    THEN value END) AS q50,
        |  max(CASE WHEN rn = greatest(1, (ns * 7500 + 9999) // 10000)
        |    THEN value END) AS q75,
        |  max(CASE WHEN rn = greatest(1, (ns * 9000 + 9999) // 10000)
        |    THEN value END) AS q90
        |FROM r GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace('\n', ' '),
    "x42_mad_outliers" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |m AS (SELECT event_type, value AS med FROM (
        |    SELECT event_type, value,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY value, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM ev) WHERE rn = (n + 1) // 2),
        |dv AS (SELECT ev.event_id, ev.event_type, ev.value, m.med,
        |    abs(ev.value - m.med) AS dev
        |  FROM ev JOIN m USING (event_type)),
        |md AS (SELECT event_type, dev AS mad FROM (
        |    SELECT event_type, dev,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM dv) WHERE rn = (n + 1) // 2)
        |SELECT d.event_id, d.event_type, d.value, d.med, md.mad
        |FROM dv d JOIN md USING (event_type)
        |WHERE d.dev > CAST('3' AS DOUBLE) * md.mad
        |ORDER BY event_id""".stripMargin.replace('\n', ' '),
    "x44_skyline" ->
      """WITH pts AS (SELECT p_retailprice AS price, p_size AS size,
        |    count(*) AS n_parts
        |  FROM part GROUP BY 1, 2)
        |SELECT price, size, n_parts FROM pts a
        |WHERE NOT EXISTS (SELECT 1 FROM pts b
        |  WHERE b.price <= a.price AND b.size >= a.size
        |    AND (b.price < a.price OR b.size > a.size))
        |ORDER BY price""".stripMargin.replace('\n', ' '),
    "w11_running_distinct" ->
      """WITH de AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |fs AS (SELECT event_type, user_id, min(ts) AS first_ts
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, date_trunc('day', first_ts) AS day,
        |    count(*) AS new_users
        |  FROM fs GROUP BY 1, 2)
        |SELECT de.event_type, de.day, de.n_events,
        |  CAST(coalesce(nd.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(nd.new_users, 0)) OVER (
        |    PARTITION BY de.event_type ORDER BY de.day) AS BIGINT)
        |    AS cum_distinct_users
        |FROM de LEFT JOIN nd ON de.event_type = nd.event_type
        |  AND de.day = nd.day
        |ORDER BY 1, 2""".stripMargin.replace('\n', ' '),
    "x50_revenue_share" ->
      """WITH rev AS (SELECT r_name, n_name, count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, n_orders,
        |  CAST(rev_d AS DOUBLE) AS revenue,
        |  CAST(rev_d AS DOUBLE) /
        |    CAST(sum(rev_d) OVER (PARTITION BY r_name) AS DOUBLE)
        |    AS share_of_region,
        |  CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE)
        |    AS share_of_total
        |FROM rev ORDER BY r_name, n_name"""
        .stripMargin.replace('\n', ' '),
    "w13_max_drawdown" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
        |  FROM events WHERE value IS NOT NULL),
        |curve AS (SELECT user_id, value,
        |    max(value) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM ev)
        |SELECT user_id, count(*) AS n_events,
        |  max(peak) AS peak_value,
        |  max((peak - value) / peak) AS max_drawdown
        |FROM curve GROUP BY 1 ORDER BY user_id"""
        .stripMargin.replace('\n', ' '),
    "x49_twap" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
        |  FROM events WHERE value IS NOT NULL),
        |seg AS (SELECT user_id, us, value,
        |    lead(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS next_us
        |  FROM ev),
        |f AS (SELECT user_id, (next_us - us) // 1000000 AS dur_s, value
        |  FROM seg WHERE next_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_segments,
        |  CAST(sum(dur_s) AS BIGINT) AS total_s,
        |  CAST(sum(CAST(round(value * CAST(dur_s AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(sum(dur_s) AS DOUBLE) AS twap
        |FROM f WHERE dur_s >= 1 GROUP BY 1 ORDER BY user_id"""
        .stripMargin.replace('\n', ' '),
    "x45_linear_attribution" ->
      """WITH purch AS (SELECT user_id, event_id AS p_id,
        |    epoch_us(ts) AS p_us, value
        |  FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL),
        |clicks AS (SELECT user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |credited AS (SELECT p.user_id, p.p_id, p.value,
        |    count(*) AS n_touches
        |  FROM purch p JOIN clicks c ON c.user_id = p.user_id
        |    AND c.c_us <= p.p_us
        |    AND p.p_us - c.c_us <= 604800000000
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, count(*) AS n_attributed_purchases,
        |  CAST(sum(n_touches) AS BIGINT) AS n_touches,
        |  CAST(sum(CAST(round(value / n_touches, 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS attributed_value
        |FROM credited GROUP BY 1 ORDER BY user_id"""
        .stripMargin.replace('\n', ' '),
    "x41_association_rules" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lp),
        |item AS (SELECT l_partkey, count(*) AS n_item FROM lp
        |  GROUP BY 1),
        |pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |    count(*) AS n_both
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, CAST(n_both AS BIGINT) AS n_both,
        |  CAST(i1.n_item AS BIGINT) AS n_p1,
        |  CAST(i2.n_item AS BIGINT) AS n_p2,
        |  CAST(n_both AS DOUBLE) / CAST(i1.n_item AS DOUBLE)
        |    AS confidence,
        |  CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |    / (CAST(i1.n_item AS DOUBLE) * CAST(i2.n_item AS DOUBLE))
        |    AS lift
        |FROM pairs
        |JOIN item i1 ON p1 = i1.l_partkey
        |JOIN item i2 ON p2 = i2.l_partkey
        |CROSS JOIN n
        |ORDER BY lift DESC, p1, p2 LIMIT 25"""
        .stripMargin.replace('\n', ' '),
    "x40_zscore_outliers" ->
      """WITH stats AS (
        |  SELECT event_type AS s_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,6))) AS sum_d,
        |    sum(CAST(value AS DECIMAL(18,6))
        |      * CAST(value AS DECIMAL(18,6))) AS sumsq_d
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |ms AS (SELECT s_type,
        |    CAST(sum_d AS DOUBLE) / n AS mean,
        |    sqrt((CAST(sumsq_d AS DOUBLE)
        |      - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE) / n)
        |      / (n - 1)) AS std
        |  FROM stats)
        |SELECT event_id, event_type, value,
        |  round((value - mean) / std, 4) AS z
        |FROM events JOIN ms ON event_type = s_type
        |WHERE value IS NOT NULL
        |  AND abs(round((value - mean) / std, 4)) >= CAST('1.5' AS DOUBLE)
        |ORDER BY event_id""".stripMargin.replace('\n', ' '),
    "x30_mode_per_group" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type AS mode_type,
        |    cnt AS n_occurrences,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cnt DESC, event_type) AS rn
        |  FROM c)
        |SELECT user_id, mode_type, n_occurrences
        |FROM r WHERE rn = 1 ORDER BY user_id"""
        .stripMargin.replace('\n', ' '),
    "x31_incremental_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(CAST(ts AS TIMESTAMP)) AS first_ts,
        |  max(CAST(ts AS TIMESTAMP)) AS last_ts
        |FROM events GROUP BY 1 ORDER BY user_id"""
        .stripMargin.replace('\n', ' '),
    "x29_gap_fill" -> withPipeline(
      """SELECT location_id, datetime, aqi_filled, was_gap FROM (
        |  WITH g AS (SELECT location_id,
        |      date_trunc('hour', datetime) AS datetime, max(aqi) AS aqi
        |    FROM silver GROUP BY 1, 2),
        |  b AS (SELECT location_id, min(datetime) AS mn,
        |      max(datetime) AS mx FROM g GROUP BY 1),
        |  spine AS (SELECT location_id,
        |      unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
        |        AS datetime FROM b),
        |  j AS (SELECT s.location_id, s.datetime, g.aqi
        |    FROM spine s LEFT JOIN g
        |      ON s.location_id = g.location_id
        |      AND s.datetime = g.datetime)
        |  SELECT location_id, datetime,
        |    last_value(aqi IGNORE NULLS) OVER (PARTITION BY location_id
        |      ORDER BY datetime
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS aqi_filled,
        |    aqi IS NULL AS was_gap
        |  FROM j)
        |ORDER BY location_id, datetime""".stripMargin.replace('\n', ' ')),
    "x28_grouping_sets" -> withPipeline(
      """SELECT country, parameter,
        |  CAST(grouping(country) * 2 + grouping(parameter) AS BIGINT)
        |    AS gid,
        |  count(*) AS n_records, round(avg(aqi), 4) AS avg_aqi
        |FROM silver
        |GROUP BY GROUPING SETS ((country), (parameter), ())
        |ORDER BY gid, country, parameter""".stripMargin.replace('\n', ' ')),
    // tombstone merge ≡ latest op per key, keys whose latest op is a
    // tombstone removed (compaction of pre-cutoff deletes commutes with
    // the global latest-op rule — a tombstoned key either stays gone or
    // is re-inserted by a later op, in both derivations)
    "x27_merge_tombstones" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |latest AS (
        |  SELECT user_id, event_type AS last_type, value AS last_value,
        |    ts AS last_ts, event_id AS last_event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT user_id, last_type, last_value, last_ts, last_event_id
        |FROM latest WHERE rn = 1 AND last_type <> 'error'
        |ORDER BY user_id""".stripMargin.replace('\n', ' '),
    "x26_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |counts AS (
        |  SELECT prev_type, event_type AS next_type,
        |    count(*) AS n_transitions
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |  CAST((n_transitions * 10000) // nullif(sum(n_transitions)
        |    OVER (PARTITION BY prev_type), 0) AS BIGINT) AS prob_bps
        |FROM counts ORDER BY prev_type, next_type"""
        .stripMargin.replace('\n', ' '),
    "x23_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP)
        |      END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP)
        |      END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        |  FROM events GROUP BY 1),
        |stages AS (
        |  SELECT user_id,
        |    t_view IS NOT NULL AS s1,
        |    (t_view IS NOT NULL AND t_click > t_view) AS s2,
        |    (t_view IS NOT NULL AND t_click > t_view
        |      AND t_purchase > t_click) AS s3
        |  FROM per_user),
        |agg AS (
        |  SELECT count(*) AS n_users,
        |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_click_after_view,
        |    CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_purchase_after_click
        |  FROM stages)
        |SELECT n_users, n_view, n_click_after_view,
        |  n_purchase_after_click,
        |  (n_view * 10000) // nullif(n_users, 0) AS view_bps,
        |  (n_click_after_view * 10000) // nullif(n_users, 0) AS click_bps,
        |  (n_purchase_after_click * 10000) // nullif(n_users, 0) AS purchase_bps
        |FROM agg""".stripMargin.replace('\n', ' '),
    "x24_cohort_retention" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |su AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS act_week FROM ev)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, act_week) // 7 AS INT)
        |    AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM su JOIN act USING (user_id)
        |WHERE act_week >= cohort_week
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""
        .stripMargin.replace('\n', ' '),
    "x22_topk_per_group" ->
      """SELECT user_id, rnk, value, event_id FROM (
        |  SELECT user_id, value, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS INT) AS rnk
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rnk <= 3 ORDER BY user_id, rnk"""
        .stripMargin.replace('\n', ' '),
    "x21_snapshot_diff" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |a AS (SELECT user_id, event_type AS old_type, value AS old_value
        |  FROM (SELECT user_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev WHERE ts >= TIMESTAMP '2024-01-01'
        |      AND ts < TIMESTAMP '2024-01-12')
        |  WHERE rn = 1),
        |b AS (SELECT user_id AS uid_b, event_type AS new_type,
        |    value AS new_value
        |  FROM (SELECT user_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev WHERE ts >= TIMESTAMP '2024-01-08'
        |      AND ts < TIMESTAMP '2024-01-20')
        |  WHERE rn = 1)
        |SELECT COALESCE(a.user_id, b.uid_b) AS user_id,
        |  CASE WHEN a.user_id IS NULL THEN 'insert'
        |       WHEN b.uid_b IS NULL THEN 'delete'
        |       WHEN old_type IS NOT DISTINCT FROM new_type
        |         AND old_value IS NOT DISTINCT FROM new_value
        |         THEN 'unchanged'
        |       ELSE 'update' END AS change_type,
        |  old_type, old_value, new_type, new_value
        |FROM a FULL JOIN b ON a.user_id = b.uid_b
        |ORDER BY user_id""".stripMargin.replace('\n', ' '),
    "x20_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS p_rank,
        |  cume_dist() OVER w AS c_dist,
        |  first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS first_price,
        |  max(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS running_max
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin.replace('\n', ' ')
  )
}
