package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.Features
import graft.queries.PipelineQueries.{gold, silver, withPipeline}

/** Registry + DuckDB oracle twins for the feature-engineering surface
  * (SURVEY.md §2.5 W1-W4, §2.7 R5-R7). Float-unstable aggregates
  * (rolling mean/std) are rounded to 4 decimals on both sides. */
object FeatureQueries {

  private val lagSql =
    """SELECT location_id, datetime, aqi,
      |  lag(aqi, 1) OVER w AS aqi_lag_1h,
      |  lag(aqi, 24) OVER w AS aqi_lag_24h,
      |  lag(aqi, 168) OVER w AS aqi_lag_168h,
      |  lead(aqi, 1) OVER w AS aqi_next
      |FROM gold
      |WINDOW w AS (PARTITION BY location_id ORDER BY datetime)
      |QUALIFY aqi_next IS NOT NULL
      |ORDER BY location_id, datetime""".stripMargin.replace('\n', ' ')

  private val rollingSql =
    """SELECT location_id, datetime, aqi,
      |  round(avg(aqi) OVER w7, 4) AS aqi_mean_7d,
      |  round(stddev_samp(aqi) OVER w7, 4) AS aqi_std_7d,
      |  max(aqi) OVER w7 AS aqi_max_7d,
      |  min(aqi) OVER w7 AS aqi_min_7d,
      |  round(avg(aqi) OVER w30, 4) AS aqi_mean_30d
      |FROM gold
      |WINDOW
      |  w7 AS (PARTITION BY location_id ORDER BY datetime
      |    ROWS BETWEEN 167 PRECEDING AND CURRENT ROW),
      |  w30 AS (PARTITION BY location_id ORDER BY datetime
      |    ROWS BETWEEN 719 PRECEDING AND CURRENT ROW)
      |ORDER BY location_id, datetime""".stripMargin.replace('\n', ' ')

  private val pollutantSql = Features.pollutants
    .map(p =>
      s"""coalesce("values"[list_position(parameters, '$p')], 0.0) AS $p""")
    .mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r5_time_features" -> ((s, d) =>
      Features.timeFeatures(gold(s, d))
        .select("location_id", "datetime", "hour", "day_of_week",
          "month_num", "day_of_year", "is_weekend")
        .orderBy("location_id", "datetime")),
    "w1_lag_lead" -> ((s, d) =>
      Features.withTarget(Features.lagFeatures(gold(s, d)))
        .select("location_id", "datetime", "aqi", "aqi_lag_1h",
          "aqi_lag_24h", "aqi_lag_168h", "aqi_next")
        .orderBy("location_id", "datetime")),
    "w3_rolling_stats" -> ((s, d) =>
      Features.rollingFeatures(gold(s, d))
        .select(col("location_id"), col("datetime"), col("aqi"),
          round(col("aqi_mean_7d"), 4).as("aqi_mean_7d"),
          round(col("aqi_std_7d"), 4).as("aqi_std_7d"),
          col("aqi_max_7d"), col("aqi_min_7d"),
          round(col("aqi_mean_30d"), 4).as("aqi_mean_30d"))
        .orderBy("location_id", "datetime")),
    // TIME-range window (24 h by actual event time, not row count):
    // over gappy series a ROWS frame silently widens its time span —
    // the RANGE frame is the correct rolling-day semantics. Ordered on
    // epoch seconds so both engines share one numeric frame definition
    "w7_time_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(unix_timestamp(col("datetime")))
        .rangeBetween(-82800, 0) // 23 h back + current hour = 24 h span
      gold(s, d)
        .select(col("location_id"), col("datetime"), col("aqi"),
          count(col("aqi")).over(w).as("n_24h"),
          round(avg(col("aqi")).over(w), 4).as("mean_24h"),
          max(col("aqi")).over(w).as("max_24h"))
        .orderBy("location_id", "datetime")
    }),
    // exact rolling median (25-row window): collect the frame, sort,
    // rank-pick index (n+1)/2 — both engines pick the IDENTICAL stored
    // double (interpolating median() builtins differ cross-engine).
    // Row-local O(w log w) per row; the frame is materialized once and
    // indexed in a separate projection
    "w10_rolling_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime")).rowsBetween(-24, 0)
      gold(s, d)
        .filter(col("aqi").isNotNull) // empty frames would index [0]
        .select(col("location_id"), col("datetime"), col("aqi"),
          array_sort(collect_list(col("aqi")).over(w)).as("win"))
        .select(col("location_id"), col("datetime"), col("aqi"),
          element_at(col("win"),
            ((size(col("win")) + 1) / lit(2)).cast("int"))
            .as("rolling_median"))
        .orderBy("location_id", "datetime")
    }),
    // rolling 24-row OLS slope (trend detection — the regression
    // sibling of w3's rolling mean/std): five decimal-exact sufficient
    // statistics per frame (n, Σx, Σy, Σxy, Σx²) with x = epoch-hour
    // re-based near the data (bounded 4-digit ints, so every decimal
    // width stays far under 38 in BOTH engines — DuckDB errors past
    // 38 on products of sums, hence the explicit down-casts in the
    // twin); slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) divides the same
    // two exact operands in both engines. x-translation cannot change
    // a slope, so the re-base constant is pure width engineering
    // ROLLING EXTREMA / Donchian breakout (w16): per station, the
    // prior-24-row high and low of aqi (frame −24..−1 — the CURRENT
    // row is excluded, else every row "touches" its own extreme) and
    // the breakout flags the channel strategy / regime monitor reads.
    // Pure min/max windows over stored values compared exactly — no
    // arithmetic, no rounding convention needed (w13 discipline); the
    // first rows of each station have no prior window → NULL bounds,
    // flags false via null-safe comparison
    "w16_rolling_extrema" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime")).rowsBetween(-24, -1)
      gold(s, d).filter(col("aqi").isNotNull)
        .select(col("location_id"), col("datetime"), col("aqi"),
          max(col("aqi")).over(w).as("high_24"),
          min(col("aqi")).over(w).as("low_24"))
        .withColumn("new_high",
          coalesce(col("aqi") > col("high_24"), lit(false)))
        .withColumn("new_low",
          coalesce(col("aqi") < col("low_24"), lit(false)))
        .orderBy("location_id", "datetime")
    }),
    "w14_rolling_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime")).rowsBetween(-23, 0)
      val x = expr("unix_micros(datetime) div 3600000000 - 473000")
        .cast("decimal(4,0)")
      val y = col("aqi").cast("decimal(9,6)")
      gold(s, d).filter(col("aqi").isNotNull)
        .select(col("location_id"), col("datetime"), col("aqi"),
          count(lit(1)).over(w).cast("decimal(3,0)").as("n"),
          sum(x).over(w).cast("decimal(14,0)").as("sx"),
          sum(y).over(w).cast("decimal(19,6)").as("sy"),
          sum(x * y).over(w).cast("decimal(27,6)").as("sxy"),
          sum(x * x).over(w).cast("decimal(19,0)").as("sxx"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .select(col("location_id"), col("datetime"), col("aqi"),
          col("n").cast("bigint").as("n_window"),
          when(col("den") =!= 0,
            (col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") / col("den").cast("double"))
            .as("slope_per_hour"))
        .orderBy("location_id", "datetime")
    }),
    // ROLLING CORRELATION (w15): 24-row windowed Pearson between the
    // series and its own 24 h lag, per station — the local
    // seasonality-strength feature (x76 gives the global ACF; this
    // gives the per-station per-time evolution a regime-change
    // monitor watches). w14's discipline: all five sufficient
    // statistics are exact DECIMAL window sums; num/dy/dz are exact
    // decimals and only the final sqrt/division run in doubles with
    // an identical tree; dy·dz would exceed decimal width 38, hence
    // the double sqrt of the exact factors. NULL (not NaN) on
    // constant windows.
    "w15_rolling_corr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wl = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
      val w = wl.rowsBetween(-23, 0)
      val base = gold(s, d).filter(col("aqi").isNotNull)
        .select(col("location_id"), col("datetime"),
          col("aqi").cast("decimal(9,6)").as("y"),
          lag(col("aqi"), 24).over(wl).cast("decimal(9,6)").as("z"))
        .filter(col("z").isNotNull)
      base
        .select(col("location_id"), col("datetime"),
          count(lit(1)).over(w).cast("decimal(3,0)").as("n"),
          sum(col("y")).over(w).cast("decimal(14,6)").as("sy"),
          sum(col("z")).over(w).cast("decimal(14,6)").as("sz"),
          sum(col("y") * col("z")).over(w).cast("decimal(26,12)")
            .as("syz"),
          sum(col("y") * col("y")).over(w).cast("decimal(26,12)")
            .as("syy"),
          sum(col("z") * col("z")).over(w).cast("decimal(26,12)")
            .as("szz"))
        .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("dz", col("n") * col("szz") - col("sz") * col("sz"))
        .select(col("location_id"), col("datetime"),
          col("n").cast("bigint").as("n_window"),
          when(col("dy") > 0 && col("dz") > 0, round(
            (col("n") * col("syz") - col("sy") * col("sz"))
              .cast("double") /
              sqrt(col("dy").cast("double") * col("dz").cast("double")),
            6)).as("corr_24h"))
        .orderBy("location_id", "datetime")
    }),
    // truncated exponential smoothing (EWMA, decay 1/2, 12 taps):
    // smoothed_t = Σ 2^(11-i)·x_{t-i} / Σ 2^(11-i) over the taps
    // present. Integer power-of-two weights are the determinism trick:
    // weight·x is an EXACT double scaling, so after round-to-6dp both
    // engines sum identical DECIMAL terms in an identical fixed order
    // (an explicit 12-term + chain, not an aggregate) — no pow(), no
    // float fold. One window pass computes all 11 lags
    "w12_ewma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
      val L = 12
      val base = gold(s, d).filter(col("aqi").isNotNull)
        .select((Seq(col("location_id"), col("datetime"), col("aqi")) ++
          (1 until L).map(i =>
            lag(col("aqi"), i).over(w).as(s"l_$i"))): _*)
      def tap(i: Int) = if (i == 0) col("aqi") else col(s"l_$i")
      val zero = lit(0).cast("decimal(24,6)")
      val num = (0 until L).map { i =>
        coalesce(round(tap(i) * lit(1L << (L - 1 - i)), 6)
          .cast("decimal(24,6)"), zero)
      }.reduce(_ + _)
      val den = (0 until L).map { i =>
        when(tap(i).isNotNull, lit(1L << (L - 1 - i))).otherwise(lit(0L))
      }.reduce(_ + _)
      base.select(col("location_id"), col("datetime"), col("aqi"),
        (num.cast("double") / den.cast("double")).as("ewma"))
        .orderBy("location_id", "datetime")
    }),
    // seasonal-naive vs persistence forecast baselines, evaluated
    // in-engine: predictions are pure lags (24 h / 1 h), errors fold
    // into DECIMAL-exact sums per station, and RMSE/MAE divide+sqrt the
    // same exact operands in both engines — the eval harness a forecast
    // pipeline runs before trusting any model
    "ml6_seasonal_baseline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
      def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(24,6)")
      gold(s, d)
        .select(col("location_id"), col("datetime"), col("aqi"),
          lag(col("aqi"), 24).over(w).as("p_seasonal"),
          lag(col("aqi"), 1).over(w).as("p_persist"))
        .filter(col("p_seasonal").isNotNull && col("p_persist").isNotNull)
        .groupBy(col("location_id"))
        .agg(count(lit(1)).as("n"),
          sum(d6((col("aqi") - col("p_seasonal")) *
            (col("aqi") - col("p_seasonal")))).as("sse_s"),
          sum(d6(abs(col("aqi") - col("p_seasonal")))).as("sae_s"),
          sum(d6((col("aqi") - col("p_persist")) *
            (col("aqi") - col("p_persist")))).as("sse_p"),
          sum(d6(abs(col("aqi") - col("p_persist")))).as("sae_p"))
        .select(col("location_id"), col("n"),
          sqrt(col("sse_s").cast("double") / col("n"))
            .as("rmse_seasonal"),
          (col("sae_s").cast("double") / col("n")).as("mae_seasonal"),
          sqrt(col("sse_p").cast("double") / col("n"))
            .as("rmse_persistence"),
          (col("sae_p").cast("double") / col("n")).as("mae_persistence"))
        .orderBy("location_id")
    }),
    // LEARNING CURVE — "how much data do we need", the question every
    // training-data budget decision turns on: persistence-baseline
    // RMSE at cumulative 25/50/75/100% station slices. Slices are
    // content-hash cuts (the t6/ml9 convention: RNG-free, nested by
    // construction, partition-invariant), and ALL four slices compute
    // in ONE aggregate over the lag pass — conditional decimal sums
    // per cut, exploded to rows — so the curve costs one window + one
    // aggregate no matter how many points it has
    "ml14_learning_curve" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
      def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(24,6)")
      val err2 = d6((col("aqi") - col("p_persist")) *
        (col("aqi") - col("p_persist")))
      val scored = gold(s, d)
        .select(col("location_id"), col("datetime"), col("aqi"),
          lag(col("aqi"), 1).over(w).as("p_persist"))
        .filter(col("p_persist").isNotNull)
        .withColumn("h",
          conv(substring(md5(col("location_id").cast("string")), 1, 4),
            16, 10).cast("long"))
      val cuts = Seq(25 -> 16384L, 50 -> 32768L, 75 -> 49152L,
        100 -> 65536L)
      val aggs = cuts.flatMap { case (pct, cut) => Seq(
        sum(when(col("h") < cut, 1L).otherwise(0L)).as(s"n_$pct"),
        sum(when(col("h") < cut, err2).otherwise(d6(lit(0))))
          .as(s"sse_$pct"),
        countDistinct(when(col("h") < cut, col("location_id")))
          .as(s"ns_$pct"))
      }
      scored.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cuts.map { case (pct, _) => struct(
          lit(pct).as("train_pct"),
          col(s"ns_$pct").as("n_stations"),
          col(s"n_$pct").as("n_preds"),
          when(col(s"n_$pct") > 0,
            sqrt(col(s"sse_$pct").cast("double") / col(s"n_$pct")))
            .as("rmse"))
        }: _*)).as("r"))
        .select(col("r.train_pct"), col("r.n_stations"),
          col("r.n_preds"), col("r.rmse"))
        .orderBy("train_pct")
    }),
    // unpivot (melt): the wide pollutant matrix back to long — the
    // inverse of r6/x2, one row-local expand (no shuffle); null-valued
    // cells drop like the SQL UNPIVOT default
    "x33_unpivot" -> ((s, d) =>
      Features.pollutantColumns(gold(s, d))
        .select((Seq("location_id", "datetime") ++
          graft.features.Features.pollutants).map(col): _*)
        .unpivot(Array(col("location_id"), col("datetime")),
          graft.features.Features.pollutants.map(col).toArray,
          "pollutant", "value")
        .filter(col("value").isNotNull)
        .orderBy("location_id", "datetime", "pollutant")),
    "r6_pollutant_columns" -> ((s, d) =>
      Features.pollutantColumns(gold(s, d))
        .select(Seq(col("location_id"), col("datetime")) ++
          Features.pollutants.map(col): _*)
        .orderBy("location_id", "datetime")),
    "r7_country_encoding" -> ((s, d) =>
      Features.countryEncoding(gold(s, d)).orderBy("country")),
    "ml_feature_matrix" -> ((s, d) =>
      // encode from silver: same distinct-country set, but the encoding
      // branch never re-runs the gold roll-up (plan-shape test pins this)
      Features.featureMatrix(gold(s, d), Some(silver(s, d)))
        .withColumn("aqi_mean_7d", round(col("aqi_mean_7d"), 4))
        .withColumn("aqi_std_7d", round(col("aqi_std_7d"), 4))
        .withColumn("aqi_mean_30d", round(col("aqi_mean_30d"), 4))
        .orderBy("location_id", "datetime")),
    // serving-time twin of app.py's create_features_for_prediction:
    // every station's latest snapshot → the 22 inference features
    "ml_infer_features" -> ((s, d) =>
      Features.inferenceFeatures(gold(s, d))
        .orderBy("location_id")),
    // distributed ridge normal equations: the whole distributed cost is
    // ONE aggregate computing 46 decimal-exact sufficient statistics;
    // the 8×8 solve is driver-side (NormalEquationsSpec)
    "ml2_normal_equations" -> ((s, d) =>
      graft.ml.NormalEquations.gram(
        graft.ml.NormalEquations.designMatrix(gold(s, d)))),
    // SPLIT-CONFORMAL intervals (ml25): distribution-free 90%
    // prediction intervals around the spend~clicks OLS — content-hash
    // train/cal/test split, integer rank-pick q-hat at
    // ceil((ncal+1)*0.9), all-integer micro outputs; the uncertainty
    // half of the eval stack next to ml16's calibration
    "ml25_conformal_intervals" -> ((s, d) =>
      graft.ml.Conformal.intervals(perUserSpendClicks(s, d),
        "user_id", "x", "y")),
    // ml25c_* CANARIES: one-column slices of the SAME ml25 pipeline.
    // In round 10 they fingerprinted the 4-round driver hash-red to
    // EXACTLY the raw DECIMAL(18,2) y passthrough (ids/pred/qhat/cov
    // all green, y red — a decimal canonicalization difference in the
    // driver's DuckDB build, not a value difference: pred is derived
    // from yc and was green). Round 11 applies the round-8 discipline
    // — no decimal crosses the engine boundary — so the observed value
    // now rides as BIGINT cents (y_cents) in ml25 and the y slice;
    // ConformalSpec keeps a raw-decimal parity fixture locally.
    "ml25c_ids" -> ((s, d) => graft.ml.Conformal.slice(
      perUserSpendClicks(s, d), "user_id", "x", "y", "ids")),
    "ml25c_pred" -> ((s, d) => graft.ml.Conformal.slice(
      perUserSpendClicks(s, d), "user_id", "x", "y", "pred")),
    "ml25c_qhat" -> ((s, d) => graft.ml.Conformal.slice(
      perUserSpendClicks(s, d), "user_id", "x", "y", "qhat")),
    "ml25c_y" -> ((s, d) => graft.ml.Conformal.slice(
      perUserSpendClicks(s, d), "user_id", "x", "y", "y")),
    "ml25c_cov" -> ((s, d) => graft.ml.Conformal.slice(
      perUserSpendClicks(s, d), "user_id", "x", "y", "cov")),
    // EXACT linear-model Shapley (ml15): spend regressed on clicks
    // and views (closed-form 2-feature OLS from nine exact sums in
    // one pass), then per-row attributions phi_j = beta_j(x_j - mean)
    // with base = mean(y) and pred = base + sum(phi) exactly — which
    // feature drove THIS user's prediction, no sampling
    "ml15_linear_shap" -> ((s, d) => {
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x2"),
          coalesce(sum(col("value").cast("decimal(18,2)")),
            lit(0).cast("decimal(18,2)")).as("y"))
      graft.ml.LinearShap.attribute(per, "user_id", "x1", "x2", "y",
        explainFilter = col("id") % 50 === 3)
    }),
    // EXACT leave-one-out influence (ml24): refit spend ~ clicks
    // WITHOUT each explained user via closed-form sufficient-stat
    // subtraction (no per-unit retrain pass) and report how the
    // model's prediction at the user's own x moves — the
    // data-valuation primitive behind influence-based curation.
    // One stats pass + broadcast; all-integer micro outputs
    "ml24_loo_influence" -> ((s, d) => {
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          coalesce(sum(col("value").cast("decimal(18,2)")),
            lit(0).cast("decimal(18,2)")).as("y"))
      graft.ml.LooInfluence.influence(per, "user_id", "x", "y",
        explainFilter = col("id") % 40 === 7)
    }),
    // per-segment OLS from additive sufficient statistics (ml26) —
    // one price-vs-quantity line per brand, the "million models"
    // pattern: the fact table partial-aggregates to the FK grain
    // BEFORE the dimension join (fact rows never ship through it),
    // then re-aggregates to the segment; slope/intercept are exact
    // integer micro-units via sign-safe truncating division
    "ml26_grouped_ols" -> ((s, d) =>
      graft.ml.GroupedOls.brandLines(s, d)),
    // NDCG@5 retrieval eval (ml27): sim1's ranking scored for ORDER
    // with binary label-match relevance — sim11 measures recall (did
    // truth make the list), this scores whether relevant results rank
    // FIRST. Position discounts are metric constants, embedded as
    // precomputed e6 integer literals (dq9 discipline): DCG is an
    // exact integer dot product, IDCG a literal lookup, no doubles
    "ml27_ndcg_eval" -> ((s, d) => {
      val emb = PipelineQueries.table(s, d, "embeddings")
      graft.ml.RankingMetrics.ndcgAtK(
        graft.sim.Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 20), k = 5),
        emb, k = 5)
    }),
    // exact tied-rank ROC-AUC + fixed-threshold confusion metrics over
    // the embeddings table (label >= 5 plays the positive class, one
    // embedding coordinate plays the model score)
    "ml3_auc" -> ((s, d) =>
      graft.ml.Metrics.binaryAuc(scoredEmbeddings(s, d))),
    "ml4_confusion" -> ((s, d) =>
      graft.ml.Metrics.confusionAtThreshold(scoredEmbeddings(s, d),
        threshold = 0.0)),
    "ml5_calibration" -> ((s, d) =>
      graft.ml.Metrics.calibrationTable(scoredEmbeddings(s, d),
        lo = -0.5, hi = 0.5, bins = 10)),
    // decile lift table — the campaign-targeting eval: users ranked by
    // predicted propensity (click count), decile over a tie-free
    // total order, per-decile conversion rate / cumulative capture /
    // lift vs the base rate. Every metric is int/int divisions of
    // identical operands; the cumulative window runs over 10 rows.
    // The rank is USER-GRAIN, so it uses the two-phase range-
    // partitioned rank (Ids.withOrderedIds) rather than ntile's
    // single-partition global window; the decile boundary arithmetic
    // below reproduces SQL NTILE exactly (first n%10 buckets take one
    // extra row), so the DuckDB twin keeps its plain ntile(10)
    "ml8_lift_table" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
      // one ascending sort key = (desc n_clicks, asc user_id): both
      // legs zero-padded fixed width, clicks complemented for DESC
      val keyed = per.withColumn("__ord", concat(
        graft.etl.Ids.fixedWidthKey(
          lit(Long.MaxValue) - col("n_clicks"), 20),
        graft.etl.Ids.fixedWidthKey(col("user_id"), 20)))
      val ranked = graft.etl.Ids.withOrderedIds(keyed, "__ord", "__rnk")
        .drop("__ord")
      // NTILE(10) as exact boundary arithmetic from the broadcast count
      val deciled = graft.etl.Ids
        .exactNtile(ranked, "__rnk", 10, "decile")
        .drop("__rnk")
      val tot = deciled.agg(count(lit(1)).as("t_users"),
        sum(col("converted")).as("t_conv"))
      deciled
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_conv"))
        .crossJoin(broadcast(tot))
        .withColumn("cum_conv", sum(col("n_conv")).over(Window
          .orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("decile"), col("n_users"), col("n_conv"),
          (col("n_conv").cast("double") / col("n_users").cast("double"))
            .as("conv_rate"),
          (col("cum_conv").cast("double") / col("t_conv").cast("double"))
            .as("cum_capture"),
          ((col("n_conv").cast("double") / col("n_users").cast("double"))
            / (col("t_conv").cast("double") / col("t_users")
              .cast("double"))).as("lift"))
        .orderBy("decile")
    }),
    // k-fold cross-validation split + per-fold baseline eval: fold
    // assignment is a CONTENT-HASH range cut (md5 prefix against
    // 0x3333/0x6666/0x9999/0xcccc — the t6 stable-sample convention,
    // RNG-free, identical in both engines and on any partitioning);
    // each held-out fold evaluates the persistence baseline with
    // DECIMAL-exact error sums (the ml6 harness, fold-grained)
    "ml9_kfold_cv" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = md5(col("location_id").cast("string").cast("binary"))
      val fold = when(substring(h, 1, 4) < "3333", 0)
        .when(substring(h, 1, 4) < "6666", 1)
        .when(substring(h, 1, 4) < "9999", 2)
        .when(substring(h, 1, 4) < "cccc", 3).otherwise(4)
      val w = Window.partitionBy(col("location_id"))
        .orderBy(col("datetime"))
      def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(24,6)")
      gold(s, d)
        .select(col("location_id"), col("datetime"), col("aqi"),
          lag(col("aqi"), 1).over(w).as("pred"))
        .filter(col("pred").isNotNull)
        .withColumn("fold", fold)
        .groupBy(col("fold"))
        .agg(countDistinct(col("location_id")).as("n_stations"),
          count(lit(1)).as("n_rows"),
          sum(d6((col("aqi") - col("pred")) *
            (col("aqi") - col("pred")))).as("sse_d"))
        .select(col("fold"), col("n_stations"), col("n_rows"),
          sqrt(col("sse_d").cast("double") / col("n_rows"))
            .as("rmse_persistence"))
        .orderBy("fold")
    }),
    // logistic regression by IRLS (graft.ml.LogisticIrls): 3 Newton
    // iterations, each ONE aggregate pass of five decimal-exact
    // sufficient statistics; the oracle unrolls the same iterations as
    // CTEs, so the emitted beta trajectory is bit-identical
    "ml7_logistic_irls" -> ((s, d) => {
      val ev = PipelineQueries.table(s, d, "events")
        .filter(col("value").isNotNull)
        .select((col("value") / lit(100)).as("x"),
          when(col("event_type") === "purchase", 1.0)
            .otherwise(0.0).as("y"))
      graft.ml.LogisticIrls.train(ev, "x", "y", iters = 3)
    }),
    // decision-THRESHOLD SWEEP (the eval table ml3/ml4/ml5 lead to:
    // which cutoff ships): per threshold t in 1..10, the confusion
    // counts and precision/recall/F1 of "predict converter iff
    // n_clicks ≥ t". Everything reduces to the (score → n_pos, n_neg)
    // GRAIN first (scores are per-user click counts — domain-bounded),
    // so the sweep is a 10×|scores| join on metadata-sized tables and
    // the corpus contributes exactly one user-grain aggregate. Metrics
    // are int/int divisions of identical operands rounded to 6dp;
    // F1's harmonic mean evaluates the same double expression in both
    // engines
    "ml13_threshold_sweep" -> ((s, d) => {
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      val grain = per.groupBy(col("score"))
        .agg(sum(col("label")).as("np"),
          (count(lit(1)) - sum(col("label"))).as("nn"))
      val tot = grain.agg(sum(col("np")).as("p"), sum(col("nn")).as("n"))
      val prec = col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double")
      val rec = col("tp").cast("double") / col("p").cast("double")
      s.range(1, 11).select(col("id").as("threshold"))
        .join(broadcast(grain), col("score") >= col("threshold"), "left")
        .groupBy(col("threshold"))
        .agg(coalesce(sum(col("np")), lit(0L)).as("tp"),
          coalesce(sum(col("nn")), lit(0L)).as("fp"))
        .crossJoin(broadcast(tot))
        .select(col("threshold"), col("tp"), col("fp"),
          (col("p") - col("tp")).as("fn"),
          (col("n") - col("fp")).as("tn"),
          when(col("tp") + col("fp") > 0, round(prec, 6))
            .as("precision"),
          when(col("p") > 0, round(rec, 6)).as("recall"),
          when(col("tp") > 0, round(
            lit(2.0) * prec * rec / (prec + rec), 6)).as("f1"))
        .orderBy("threshold")
    }),
    // POPULATION STABILITY INDEX — the drift monitor every deployed
    // model runs between its reference window and live traffic: ref =
    // pre-cutoff events, cur = post-cutoff; 10 bins from exact ref
    // deciles. value is 2dp-quantized, so BOTH distributions reduce to
    // domain-bounded (value → count) histograms at scan speed and
    // every decile/bin/PSI step runs on those ≤|domain| rows — no
    // global sort or window ever touches event-sized data, at any
    // corpus size. Deciles are integer rank-picks (cum·10 ≥ i·N) on
    // the cumulative histogram; binning = count-of-edges-below per
    // DISTINCT value; psi terms are ln/× of int-ratio doubles rounded
    // to 6dp, NULL when either side of a bin is empty (no ε fudge)
    "ml12_psi" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = PipelineQueries.eventsUs(s, d)
        .filter(col("value").isNotNull)
      val cutoff = 1705795200000000L // 2024-01-21 00:00:00 UTC µs
      def hist(df: DataFrame) =
        df.groupBy(col("value")).agg(count(lit(1)).as("c"))
      val hr = hist(ev.filter(col("us") < cutoff))
      val hc = hist(ev.filter(col("us") >= cutoff))
      val nr = hr.agg(sum(col("c")).as("nr"))
      val nc = hc.agg(sum(col("c")).as("nc"))
      // the reference histogram is raw-VALUE grain (unbounded distinct
      // values at scale) — cumulate two-phase, not through one task
      val edges = graft.etl.Ids.keyedCumsum(
          hr.withColumn("__k", lit(1)), "__k", Seq("value"), "c", "cum")
        .drop("__k")
        .crossJoin(broadcast(nr))
        .select(col("value"), col("cum"), col("nr"),
          explode(sequence(lit(1), lit(9))).as("i"))
        .filter(col("cum") * 10 >= col("i") * col("nr"))
        .groupBy(col("i")).agg(min(col("value")).as("edge"))
      def binned(h: DataFrame, out: String) = h
        .join(broadcast(edges), col("value") > col("edge"), "left")
        .groupBy(col("value"), col("c"))
        .agg((count(col("i")) + 1).as("bin"))
        .groupBy(col("bin")).agg(sum(col("c")).as(out))
      s.range(1, 11).select(col("id").as("bin"))
        .join(binned(hr, "n_ref"), Seq("bin"), "left")
        .join(binned(hc, "n_cur"), Seq("bin"), "left")
        .crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
        .select(col("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          when(col("n_ref") > 0 && col("n_cur") > 0, round(
            (col("n_cur").cast("double") / col("nc").cast("double") -
              col("n_ref").cast("double") / col("nr").cast("double")) *
              log((col("n_cur").cast("double") / col("nc").cast("double")) /
                (col("n_ref").cast("double") / col("nr").cast("double"))),
            6)).as("psi_term"))
        .orderBy("bin")
    }),
    // the HASHING TRICK: categorical features map straight to a fixed
    // 32-dim signed slot via md5 — NO vocabulary dictionary, so unlike
    // r7's label-encoding there is no global distinct + join to build
    // and ship an index; every row featurizes independently at scan
    // speed, which is the featurization that still works when the
    // vocabulary itself is TB-scale. Two feature families (event type,
    // UTC hour-of-day) hash into ONE shared space; the sign bit (next
    // hash bit above the slot index) gives collisions zero expected
    // bias, the classic signed-hashing construction. All integer math
    // on a 48-bit md5 prefix — both engines rebuild it exactly.
    "ml10_feature_hashing" -> ((s, d) => {
      val ev = PipelineQueries.eventsUs(s, d)
      val feats = ev.select(col("user_id"),
          concat(lit("event_type="), col("event_type")).as("feat"))
        .union(ev.select(col("user_id"),
          concat(lit("hour="),
            expr("CAST((us div 3600000000) % 24 AS STRING)"))
            .as("feat")))
      feats
        .groupBy(col("user_id"), col("feat"))
        .agg(count(lit(1)).as("c"))
        .withColumn("hh", expr(
          "CAST(conv(substring(md5(feat), 1, 12), 16, 10) AS BIGINT)"))
        .withColumn("idx", col("hh") % 32)
        .withColumn("sign", expr("(hh div 32) % 2 * 2 - 1"))
        .groupBy(col("user_id"), col("idx"))
        .agg(sum(col("sign") * col("c")).as("feat_val"))
        .filter(col("feat_val") =!= 0)
        .orderBy("user_id", "idx")
    }),
    // TARGET ENCODING with m-estimate smoothing (the third
    // featurization next to r7's label encode and ml10's hashing
    // trick): category → blend of its own target mean and the global
    // mean, enc = (sum_cat + m·μ_global) / (n_cat + m), m=10 — rare
    // categories shrink toward the prior instead of memorizing noise.
    // Sums are DECIMAL (o_totalprice is 2dp — exact at any partial-sum
    // order); doubles appear only in the two identical final
    // expressions both engines evaluate on those exact sums. One
    // aggregate over the fact join + a scalar broadcast — the encoder
    // table is category-sized, the thing a 100 TB pipeline broadcasts
    // back onto the facts.
    "ml11_target_encoding" -> ((s, d) => {
      val co = PipelineQueries.table(s, d, "orders")
        .join(PipelineQueries.table(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          col("o_totalprice").cast("decimal(18,2)").as("t"))
      val g = co.agg(sum(col("t")).as("sum_all"),
        count(lit(1)).as("n_all"))
      co.groupBy(col("c_mktsegment"))
        .agg(sum(col("t")).as("sum_cat"), count(lit(1)).as("n_cat"))
        .crossJoin(broadcast(g))
        .select(col("c_mktsegment"), col("n_cat"),
          (col("sum_cat").cast("double") / col("n_cat"))
            .as("raw_mean"),
          ((col("sum_cat").cast("double") +
            lit(10.0) * (col("sum_all").cast("double") / col("n_all"))) /
            (col("n_cat") + lit(10)).cast("double")).as("encoded"))
        .orderBy("c_mktsegment")
    }),
    // ISOTONIC CALIBRATION — the non-parametric monotone calibrator
    // (sklearn IsotonicRegression semantics) via the exact minimax
    // characterization of the PAV fit; see graft.ml.Isotonic for why
    // that form (pure joins/aggregates on the domain-bounded score
    // grain) is the distributed shape and sequential PAV is not. The
    // corpus contributes ONE user-grain aggregate (the ml13 frame:
    // score = click count, label = converted).
    "ml16_isotonic" -> ((s, d) => {
      val grain = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
        .groupBy(col("score"))
        .agg(sum(col("label")).as("np"),
          (count(lit(1)) - sum(col("label"))).as("nn"))
      graft.ml.Isotonic.calibrate(grain).orderBy("score")
    }),
    // MULTINOMIAL NAIVE BAYES over hashed token buckets (ml17): the
    // generative multiclass text classifier next to t27's
    // discriminative binary filter — language prediction on the
    // held-out content-hash half, reported as a confusion matrix. See
    // graft.ml.NaiveBayes for the broadcastable dense model + decimal
    // scoring determinism story.
    "ml17_naive_bayes" -> ((s, d) =>
      graft.ml.NaiveBayes.confusion(
        PipelineQueries.table(s, d, "documents")
          .select(col("doc_id"), col("text"), col("lang").as("cls")))),
    // PCA top component via power iteration (ml18): one corpus pass to
    // the d² covariance, 20 quantized iterations on the tiny matrix —
    // see graft.ml.Pca for the floating-point determinism discipline
    "ml18_pca_power" -> ((s, d) =>
      graft.ml.Pca.topComponent(
        PipelineQueries.table(s, d, "embeddings"))),
    // PERMUTATION feature importance (ml19) over the ml15 frame:
    // hash-rank cyclic derangement, fixed closed-form OLS, SSE
    // inflation ratio — see graft.ml.PermutationImportance
    "ml19_permutation_importance" -> ((s, d) => {
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x2"),
          coalesce(sum(col("value").cast("decimal(18,2)")),
            lit(0).cast("decimal(18,2)")).as("y"))
      graft.ml.PermutationImportance.importance(per, "user_id", "x1",
        "x2", "y")
    }),
    // MUTUAL INFORMATION feature screen (ml20): I(score; label) over
    // the ml13 user grain — the model-free feature-selection signal
    // next to ml19's model-dependent importance. Cells are the
    // domain-bounded (score, y) counts; each term is
    // (c/n)·ln(c·n / (c_s·c_y)) — integer products inside the ln so
    // both engines divide identical operands — rounded 6dp and
    // DECIMAL-summed; zero cells never materialize. Output keeps the
    // per-cell decomposition (which score levels carry the
    // information) with the total on every row.
    "ml20_mutual_info" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cells = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        .groupBy(col("score"), col("y"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // domain-bounded; referenced four times
      val n = cells.agg(sum(col("c")).as("n"))
      val cs = cells.groupBy(col("score")).agg(sum(col("c")).as("c_s"))
      val cy = cells.groupBy(col("y")).agg(sum(col("c")).as("c_y"))
      val whole = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      cells
        .join(broadcast(cs), Seq("score"))
        .join(broadcast(cy), Seq("y"))
        .crossJoin(broadcast(n))
        .withColumn("term", round(
          (col("c").cast("double") / col("n")) *
            log((col("c").cast("double") * col("n")) /
              (col("c_s").cast("double") * col("c_y"))), 6)
          .cast("decimal(38,6)"))
        .select(col("score"), col("y"), col("c").as("n_cell"),
          col("term").cast("double").as("mi_term"),
          round(sum(col("term")).over(whole).cast("double"), 6)
            .as("mi_total"))
        .orderBy("score", "y")
    }),
    // DECISION STUMP (ml21): the one-split regression tree trained
    // distributedly — the CART building block (and the weak learner
    // boosting stacks). Predict per-user purchase cents from the
    // user's click count: the corpus reduces to the user grain, then
    // to the DOMAIN-BOUNDED (clicks → n, Σy, Σy²) histogram (bounded
    // by max events per user, the ml12/x64 class), and every candidate
    // split is evaluated from cumulative sums over that bounded grain
    // — no per-candidate corpus pass, no threshold sampling. Σy² rides
    // DECIMAL(19,0)² → (38,0); SSE terms are fixed DOUBLE trees over
    // exact integers emitted UNROUNDED (the w13 identical-operands
    // discipline — round(double,6) at 1e14 magnitudes is the measured
    // x84 trap), so both engines produce bit-identical doubles
    "ml21_decision_stump" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = PipelineQueries.table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
            .as("y"))
      val hist = per
        .groupBy(col("x"))
        .agg(count(lit(1)).as("n_x"), sum(col("y")).as("s_x"),
          sum(col("y").cast("decimal(19,0)") *
            col("y").cast("decimal(19,0)")).as("q_x"))
      val cum = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      val c = hist
        .withColumn("n_l", sum(col("n_x")).over(cum))
        .withColumn("s_l", sum(col("s_x")).over(cum))
        .withColumn("q_l", sum(col("q_x")).over(cum))
        .withColumn("n_t", sum(col("n_x")).over(whole))
        .withColumn("s_t", sum(col("s_x")).over(whole))
        .withColumn("q_t", sum(col("q_x")).over(whole))
        .filter(col("n_l") < col("n_t")) // both sides non-empty
      def sse(q: org.apache.spark.sql.Column,
          sv: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        q.cast("double") -
          sv.cast("double") * sv.cast("double") / n.cast("double")
      c.select(col("x").as("threshold"), col("n_l").as("n_left"),
        (col("n_t") - col("n_l")).as("n_right"),
        (sse(col("q_t"), col("s_t"), col("n_t")) -
          sse(col("q_l"), col("s_l"), col("n_l")) -
          sse(col("q_t") - col("q_l"), col("s_t") - col("s_l"),
            col("n_t") - col("n_l"))).as("var_reduction"))
        .orderBy("threshold")
    }),
    // TWO-ROUND BOOSTED STUMPS (ml22): the distributed GBT core —
    // best stump on clicks, exact integer residual update (micro-cent
    // leaf means by truncating div), best stump on views against the
    // residuals. Each round is one domain-bounded histogram +
    // cumulative split scan (the ml21 shape); the fitted stump
    // broadcasts as one row. Argmax ties break to the smallest
    // threshold; SSE gains are unrounded fixed-tree doubles
    "ml22_gbt_stumps" -> ((s, d) =>
      graft.ml.BoostedStumps.twoRounds(
        PipelineQueries.table(s, d, "events")
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x1"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("x2"),
            sum(when(col("event_type") === "purchase",
              expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
              .as("y")))),
    // MAXIMIN k-means++-style seeding (ml23): deterministic
    // farthest-point init for x65's Lloyd loop — lowest-id seed, then
    // k−1 rounds of "pick the vector least similar to its nearest
    // chosen center" (argmin max-cosine, ties to smallest id). Each
    // round is one corpus scan under a ≤k-row broadcast + TakeOrdered
    // top-1; 4dp cosine contract shared with x10/x65
    "ml23_maximin_init" -> ((s, d) =>
      graft.ml.KMeans.maximinInit(
        PipelineQueries.table(s, d, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("vec")),
        k = 4))
  )

  /** (label, score) pairs for the evaluation metrics: positive class =
    * label ≥ 5, score = the second embedding coordinate (a float —
    * cast to double losslessly, identical in both engines). */
  /** Per-user (id, x = clicks, y = spend) — the ml15/ml24/ml25 unit
    * frame. */
  private def perUserSpendClicks(s: SparkSession, d: String)
      : DataFrame =
    PipelineQueries.table(s, d, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        coalesce(sum(col("value").cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")).as("y"))

  /** DuckDB twin of [[perUserSpendClicks]] as a parenthesized rel. */
  private val perUserSpendClicksSql: String =
    """(SELECT user_id AS id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS x,
      |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))),
      |    CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      |  FROM events GROUP BY 1)""".stripMargin.replace('\n', ' ')

  private def scoredEmbeddings(s: SparkSession, d: String): DataFrame =
    PipelineQueries.table(s, d, "embeddings")
      .select((col("label") >= 5).cast("int").as("label"),
        element_at(col("embedding"), 2).cast("double").as("score"))

  private val scoredEmbeddingsSql =
    """(SELECT CAST(label >= 5 AS INT) AS label,
      |  CAST(embedding[2] AS DOUBLE) AS score FROM embeddings)"""
      .stripMargin.replace('\n', ' ')

  val oracle: Map[String, String] = Map(
    // identical hashed buckets, dense smoothed model, decimal scoring,
    // same argmax tie-break
    "ml17_naive_bayes" -> graft.ml.NaiveBayes.confusionSql("lang"),
    "ml18_pca_power" -> graft.ml.Pca.topComponentSql(),
    // same cell grain, identical integer-operand ln terms, decimal sum
    "ml20_mutual_info" ->
      """WITH per AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS y
        |  FROM events GROUP BY 1),
        |cells AS (SELECT CAST(score AS BIGINT) AS score,
        |    CAST(y AS BIGINT) AS y, CAST(count(*) AS BIGINT) AS c
        |  FROM per GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |cs AS (SELECT score, CAST(sum(c) AS BIGINT) AS c_s
        |  FROM cells GROUP BY 1),
        |cy AS (SELECT y, CAST(sum(c) AS BIGINT) AS c_y
        |  FROM cells GROUP BY 1),
        |t AS (SELECT cells.score, cells.y, cells.c,
        |    CAST(round((CAST(c AS DOUBLE) / n) *
        |      ln((CAST(c AS DOUBLE) * n) /
        |         (CAST(c_s AS DOUBLE) * c_y)), 6) AS DECIMAL(38,6))
        |      AS term
        |  FROM cells JOIN cs USING (score) JOIN cy USING (y)
        |  CROSS JOIN nn)
        |SELECT score, y, c AS n_cell, CAST(term AS DOUBLE) AS mi_term,
        |  round(CAST(sum(term) OVER () AS DOUBLE), 6) AS mi_total
        |FROM t ORDER BY score, y""".stripMargin.replace('\n', ' '),
    // same unrolled rounds, 4dp cosine, (ms, vec_id) argmin
    "ml23_maximin_init" -> graft.ml.KMeans.maximinInitSql(k = 4),
    // same histograms, HUGEINT fixed-point means, tie-broken argmax
    "ml22_gbt_stumps" -> graft.ml.BoostedStumps.twoRoundsSql(
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS x1,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS x2,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |    AS BIGINT) AS y
        |FROM events GROUP BY 1""".stripMargin.replace('\n', ' ')),
    // same domain-bounded histogram, cumulative splits, unrounded
    // fixed-tree SSE doubles over exact integer operands
    "ml21_decision_stump" ->
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |hist AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x,
        |    CAST(sum(y) AS BIGINT) AS s_x,
        |    CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS q_x
        |  FROM per GROUP BY 1),
        |c AS (SELECT x,
        |    CAST(sum(n_x) OVER w AS BIGINT) AS n_l,
        |    CAST(sum(s_x) OVER w AS BIGINT) AS s_l,
        |    CAST(sum(q_x) OVER w AS DECIMAL(38,0)) AS q_l,
        |    CAST(sum(n_x) OVER () AS BIGINT) AS n_t,
        |    CAST(sum(s_x) OVER () AS BIGINT) AS s_t,
        |    CAST(sum(q_x) OVER () AS DECIMAL(38,0)) AS q_t
        |  FROM hist
        |  WINDOW w AS (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT x AS threshold, n_l AS n_left, n_t - n_l AS n_right,
        |  (CAST(q_t AS DOUBLE) -
        |     CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) /
        |       CAST(n_t AS DOUBLE)) -
        |  (CAST(q_l AS DOUBLE) -
        |     CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE) /
        |       CAST(n_l AS DOUBLE)) -
        |  (CAST(q_t - q_l AS DOUBLE) -
        |     CAST(s_t - s_l AS DOUBLE) * CAST(s_t - s_l AS DOUBLE) /
        |       CAST(n_t - n_l AS DOUBLE)) AS var_reduction
        |FROM c WHERE n_l < n_t
        |ORDER BY threshold""".stripMargin.replace('\n', ' '),
    "ml19_permutation_importance" -> graft.ml.PermutationImportance.sql(
      """(SELECT user_id AS id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS DECIMAL(18,0)) AS x1,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS DECIMAL(18,0)) AS x2,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))), 0)
        |    AS DECIMAL(18,2)) AS y
        |FROM events GROUP BY 1)""".stripMargin.replace('\n', ' ')),
    // identical cumulative-sum interval means + minimax lattice over the
    // same user-grain (score, np, nn) reduction
    "ml16_isotonic" -> (graft.ml.Isotonic.calibrateSql(
      """SELECT CAST(score AS BIGINT) AS score,
        |  CAST(sum(label) AS BIGINT) AS np,
        |  CAST(count(*) - sum(label) AS BIGINT) AS nn
        |FROM (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS label
        |  FROM events GROUP BY 1) GROUP BY 1"""
        .stripMargin.replace('\n', ' ')) + " ORDER BY score"),
    // decimal-exact sums; the two final double expressions are spelled
    // identically to the Spark side (cast, ×10.0 prior, ÷(n+10))
    "ml11_target_encoding" ->
      """WITH co AS (SELECT c_mktsegment,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS t
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT sum(t) AS sum_all, count(*) AS n_all FROM co),
        |c AS (SELECT c_mktsegment, sum(t) AS sum_cat,
        |    count(*) AS n_cat FROM co GROUP BY 1)
        |SELECT c_mktsegment, CAST(n_cat AS BIGINT) AS n_cat,
        |  CAST(sum_cat AS DOUBLE) / n_cat AS raw_mean,
        |  (CAST(sum_cat AS DOUBLE)
        |    + 10.0 * (CAST(sum_all AS DOUBLE) / n_all))
        |    / CAST(n_cat + 10 AS DOUBLE) AS encoded
        |FROM c CROSS JOIN g ORDER BY c_mktsegment"""
        .stripMargin.replace('\n', ' '),
    // same nested content-hash slices; DuckDB's filtered conditional
    // sums mirror the one-aggregate construction
    "ml14_learning_curve" -> withPipeline(
      """, sc AS (SELECT location_id, aqi,
        |    lag(aqi, 1) OVER (PARTITION BY location_id
        |      ORDER BY datetime) AS p,
        |    CAST(('0x' || substr(md5(CAST(location_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) AS h
        |  FROM gold),
        |f AS (SELECT * FROM sc WHERE p IS NOT NULL),
        |sl AS (SELECT * FROM (VALUES (25, 16384), (50, 32768),
        |  (75, 49152), (100, 65536)) AS v(pct, cut))
        |SELECT CAST(pct AS INT) AS train_pct,
        |  count(DISTINCT CASE WHEN h < cut THEN location_id END)
        |    AS n_stations,
        |  CAST(sum(CASE WHEN h < cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_preds,
        |  CASE WHEN sum(CASE WHEN h < cut THEN 1 ELSE 0 END) > 0 THEN
        |    sqrt(CAST(sum(CASE WHEN h < cut
        |        THEN CAST((aqi - p) * (aqi - p) AS DECIMAL(24,6))
        |        ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
        |      / sum(CASE WHEN h < cut THEN 1 ELSE 0 END))
        |  END AS rmse
        |FROM f CROSS JOIN sl GROUP BY pct ORDER BY train_pct"""
        .stripMargin.replace('\n', ' ')),
    // same score-grain reduction; F1 guarded on tp>0 (prec+rec=0 would
    // 0/0) exactly like the engine side
    "ml13_threshold_sweep" ->
      """WITH per AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS label
        |  FROM events GROUP BY 1),
        |grain AS (SELECT score, sum(label) AS np,
        |    count(*) - sum(label) AS nn
        |  FROM per GROUP BY 1),
        |tot AS (SELECT sum(np) AS p, sum(nn) AS n FROM grain),
        |sw AS (SELECT t.threshold,
        |    CAST(coalesce(sum(g.np), 0) AS BIGINT) AS tp,
        |    CAST(coalesce(sum(g.nn), 0) AS BIGINT) AS fp
        |  FROM (SELECT unnest(range(1, 11)) AS threshold) t
        |  LEFT JOIN grain g ON g.score >= t.threshold
        |  GROUP BY 1)
        |SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp,
        |  CAST(p - tp AS BIGINT) AS fn, CAST(n - fp AS BIGINT) AS tn,
        |  CASE WHEN tp + fp > 0 THEN
        |    round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
        |  CASE WHEN p > 0 THEN
        |    round(CAST(tp AS DOUBLE) / p, 6) END AS recall,
        |  CASE WHEN tp > 0 THEN round(
        |    2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) *
        |      (CAST(tp AS DOUBLE) / p) /
        |    ((CAST(tp AS DOUBLE) / (tp + fp)) + (CAST(tp AS DOUBLE) / p)),
        |    6) END AS f1
        |FROM sw CROSS JOIN tot ORDER BY threshold"""
        .stripMargin.replace('\n', ' '),
    // same histogram-level construction: integer rank-pick deciles on
    // the cumulative (value → count) table, edge-count binning, 1..10
    // spine, NULL psi term when either side of a bin is empty
    "ml12_psi" ->
      """WITH ev AS (SELECT value, epoch_us(ts) AS us FROM events
        |  WHERE value IS NOT NULL),
        |hr AS (SELECT value, count(*) AS c FROM ev
        |  WHERE us < 1705795200000000 GROUP BY 1),
        |hc AS (SELECT value, count(*) AS c FROM ev
        |  WHERE us >= 1705795200000000 GROUP BY 1),
        |nr AS (SELECT sum(c) AS nr FROM hr),
        |nc AS (SELECT sum(c) AS nc FROM hc),
        |cm AS (SELECT value, sum(c) OVER (ORDER BY value) AS cum FROM hr),
        |edges AS (SELECT i, min(value) AS edge
        |  FROM cm CROSS JOIN nr CROSS JOIN unnest(range(1, 10)) AS t(i)
        |  WHERE cum * 10 >= i * nr GROUP BY 1),
        |br AS (SELECT bin, sum(c) AS n_ref FROM (
        |    SELECT h.value, h.c, 1 + count(e.i) AS bin
        |    FROM hr h LEFT JOIN edges e ON h.value > e.edge
        |    GROUP BY 1, 2) GROUP BY 1),
        |bc AS (SELECT bin, sum(c) AS n_cur FROM (
        |    SELECT h.value, h.c, 1 + count(e.i) AS bin
        |    FROM hc h LEFT JOIN edges e ON h.value > e.edge
        |    GROUP BY 1, 2) GROUP BY 1),
        |spine AS (SELECT unnest(range(1, 11)) AS bin)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
        |  CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN round(
        |    (CAST(n_cur AS DOUBLE) / nc - CAST(n_ref AS DOUBLE) / nr) *
        |    ln((CAST(n_cur AS DOUBLE) / nc) /
        |       (CAST(n_ref AS DOUBLE) / nr)), 6)
        |  END AS psi_term
        |FROM spine LEFT JOIN br USING (bin) LEFT JOIN bc USING (bin)
        |CROSS JOIN nr CROSS JOIN nc ORDER BY bin"""
        .stripMargin.replace('\n', ' '),
    // same 48-bit md5-prefix hash: DuckDB parses the hex via a 0x cast,
    // Spark via conv(..., 16, 10) — identical integers
    "ml10_feature_hashing" ->
      """WITH f AS (
        |  SELECT user_id, 'event_type=' || event_type AS feat
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, 'hour=' || CAST(hour(ts) AS VARCHAR) AS feat
        |  FROM events),
        |g AS (SELECT user_id, feat, count(*) AS c FROM f GROUP BY 1, 2),
        |h AS (SELECT user_id, c,
        |    ('0x' || substr(md5(feat), 1, 12))::BIGINT AS hh
        |  FROM g)
        |SELECT user_id, hh % 32 AS idx,
        |  CAST(sum(((hh // 32) % 2 * 2 - 1) * c) AS BIGINT) AS feat_val
        |FROM h GROUP BY 1, 2
        |HAVING sum(((hh // 32) % 2 * 2 - 1) * c) <> 0
        |ORDER BY user_id, idx""".stripMargin.replace('\n', ' '),
    "r5_time_features" -> withPipeline(
      """SELECT location_id, datetime,
        |  CAST(hour(datetime) AS INT) AS hour,
        |  CAST(isodow(datetime) - 1 AS INT) AS day_of_week,
        |  CAST(month(datetime) AS INT) AS month_num,
        |  CAST(dayofyear(datetime) AS INT) AS day_of_year,
        |  isodow(datetime) - 1 >= 5 AS is_weekend
        |FROM gold ORDER BY location_id, datetime"""
        .stripMargin.replace('\n', ' ')),
    "w1_lag_lead" -> withPipeline(lagSql),
    "w10_rolling_median" -> withPipeline(
      """, x AS (SELECT location_id, datetime, aqi,
        |  list_sort(list(aqi) OVER (PARTITION BY location_id
        |    ORDER BY datetime
        |    ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) AS win
        |  FROM gold WHERE aqi IS NOT NULL)
        |SELECT location_id, datetime, aqi,
        |  win[(len(win) + 1) // 2] AS rolling_median
        |FROM x ORDER BY location_id, datetime"""
        .stripMargin.replace('\n', ' ')),
    // sums explicitly down-cast to Spark's widths so the ΣxΣy /
    // (Σx)² products stay under DuckDB's 38-digit ceiling
    // same −24..−1 frame, NULL-bounded first rows, exact comparisons
    "w16_rolling_extrema" -> withPipeline(
      """, b AS (SELECT location_id, datetime, aqi,
        |    max(aqi) OVER w AS high_24, min(aqi) OVER w AS low_24
        |  FROM gold WHERE aqi IS NOT NULL
        |  WINDOW w AS (PARTITION BY location_id ORDER BY datetime
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT location_id, datetime, aqi, high_24, low_24,
        |  coalesce(aqi > high_24, FALSE) AS new_high,
        |  coalesce(aqi < low_24, FALSE) AS new_low
        |FROM b ORDER BY location_id, datetime"""
        .stripMargin.replace('\n', ' ')),
    "w14_rolling_slope" -> withPipeline(
      """, b AS (SELECT location_id, datetime, aqi,
        |    epoch_us(datetime) // 3600000000 - 473000 AS x
        |  FROM gold WHERE aqi IS NOT NULL),
        |st AS (SELECT location_id, datetime, aqi,
        |    CAST(count(*) OVER w AS DECIMAL(3,0)) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(4,0))) OVER w
        |      AS DECIMAL(14,0)) AS sx,
        |    CAST(sum(CAST(aqi AS DECIMAL(9,6))) OVER w
        |      AS DECIMAL(19,6)) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(4,0)) * CAST(aqi AS DECIMAL(9,6)))
        |      OVER w AS DECIMAL(27,6)) AS sxy,
        |    CAST(sum(CAST(x AS DECIMAL(4,0)) * CAST(x AS DECIMAL(4,0)))
        |      OVER w AS DECIMAL(19,0)) AS sxx
        |  FROM b
        |  WINDOW w AS (PARTITION BY location_id ORDER BY datetime
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT location_id, datetime, aqi,
        |  CAST(n AS BIGINT) AS n_window,
        |  CASE WHEN n * sxx - sx * sx <> 0 THEN
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE)
        |  END AS slope_per_hour
        |FROM st ORDER BY location_id, datetime"""
        .stripMargin.replace('\n', ' ')),
    // same exact decimal sufficient statistics; double only at the
    // final sqrt/division with the identical tree
    "w15_rolling_corr" -> withPipeline(
      """, b0 AS (SELECT location_id, datetime,
        |    CAST(aqi AS DECIMAL(9,6)) AS y,
        |    CAST(lag(aqi, 24) OVER (PARTITION BY location_id
        |      ORDER BY datetime) AS DECIMAL(9,6)) AS z
        |  FROM gold WHERE aqi IS NOT NULL),
        |b AS (SELECT * FROM b0 WHERE z IS NOT NULL),
        |st AS (SELECT location_id, datetime,
        |    CAST(count(*) OVER w AS DECIMAL(3,0)) AS n,
        |    CAST(sum(y) OVER w AS DECIMAL(14,6)) AS sy,
        |    CAST(sum(z) OVER w AS DECIMAL(14,6)) AS sz,
        |    CAST(sum(CAST(y * z AS DECIMAL(26,12))) OVER w
        |      AS DECIMAL(26,12)) AS syz,
        |    CAST(sum(CAST(y * y AS DECIMAL(26,12))) OVER w
        |      AS DECIMAL(26,12)) AS syy,
        |    CAST(sum(CAST(z * z AS DECIMAL(26,12))) OVER w
        |      AS DECIMAL(26,12)) AS szz
        |  FROM b
        |  WINDOW w AS (PARTITION BY location_id ORDER BY datetime
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT location_id, datetime,
        |  CAST(n AS BIGINT) AS n_window,
        |  CASE WHEN n * syy - CAST(sy AS DECIMAL(19,6)) * sy > 0
        |    AND n * szz - CAST(sz AS DECIMAL(19,6)) * sz > 0
        |  THEN round(
        |    CAST(n * syz - CAST(sy AS DECIMAL(19,6)) * sz AS DOUBLE) /
        |    sqrt(CAST(n * syy - CAST(sy AS DECIMAL(19,6)) * sy
        |        AS DOUBLE) *
        |      CAST(n * szz - CAST(sz AS DECIMAL(19,6)) * sz
        |        AS DOUBLE)), 6)
        |  END AS corr_24h
        |FROM st ORDER BY location_id, datetime"""
        .stripMargin.replace('\n', ' ')),
    "ml6_seasonal_baseline" -> withPipeline(
      """, p AS (SELECT location_id, aqi,
        |    lag(aqi, 24) OVER w AS p_seasonal,
        |    lag(aqi, 1) OVER w AS p_persist
        |  FROM gold
        |  WINDOW w AS (PARTITION BY location_id ORDER BY datetime)),
        |s AS (SELECT location_id, count(*) AS n,
        |    sum(CAST((aqi - p_seasonal) * (aqi - p_seasonal)
        |      AS DECIMAL(24,6))) AS sse_s,
        |    sum(CAST(abs(aqi - p_seasonal) AS DECIMAL(24,6))) AS sae_s,
        |    sum(CAST((aqi - p_persist) * (aqi - p_persist)
        |      AS DECIMAL(24,6))) AS sse_p,
        |    sum(CAST(abs(aqi - p_persist) AS DECIMAL(24,6))) AS sae_p
        |  FROM p
        |  WHERE p_seasonal IS NOT NULL AND p_persist IS NOT NULL
        |  GROUP BY 1)
        |SELECT location_id, n,
        |  sqrt(CAST(sse_s AS DOUBLE) / n) AS rmse_seasonal,
        |  CAST(sae_s AS DOUBLE) / n AS mae_seasonal,
        |  sqrt(CAST(sse_p AS DOUBLE) / n) AS rmse_persistence,
        |  CAST(sae_p AS DOUBLE) / n AS mae_persistence
        |FROM s ORDER BY location_id""".stripMargin.replace('\n', ' ')),
    "w3_rolling_stats" -> withPipeline(rollingSql),
    "w7_time_range_window" -> withPipeline(
      """SELECT location_id, datetime, aqi,
        |  count(aqi) OVER w AS n_24h,
        |  round(avg(aqi) OVER w, 4) AS mean_24h,
        |  max(aqi) OVER w AS max_24h
        |FROM gold
        |WINDOW w AS (PARTITION BY location_id ORDER BY epoch(datetime)
        |  RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
        |ORDER BY location_id, datetime""".stripMargin.replace('\n', ' ')),
    "r6_pollutant_columns" -> withPipeline(
      s"SELECT location_id, datetime, $pollutantSql " +
        "FROM gold ORDER BY location_id, datetime"),
    "ml2_normal_equations" ->
      withPipeline(graft.ml.NormalEquations.gramSql),
    "ml25_conformal_intervals" ->
      graft.ml.Conformal.sql(perUserSpendClicksSql),
    "ml25c_ids" ->
      graft.ml.Conformal.sliceSql(perUserSpendClicksSql, "ids"),
    "ml25c_pred" ->
      graft.ml.Conformal.sliceSql(perUserSpendClicksSql, "pred"),
    "ml25c_qhat" ->
      graft.ml.Conformal.sliceSql(perUserSpendClicksSql, "qhat"),
    "ml25c_y" ->
      graft.ml.Conformal.sliceSql(perUserSpendClicksSql, "y"),
    "ml25c_cov" ->
      graft.ml.Conformal.sliceSql(perUserSpendClicksSql, "cov"),
    "ml24_loo_influence" -> graft.ml.LooInfluence.sql(
      """(SELECT user_id AS id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS x,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))),
        |    CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |  FROM events GROUP BY 1)""".stripMargin.replace('\n', ' '),
      "id % 40 = 7"),
    "ml26_grouped_ols" -> graft.ml.GroupedOls.brandLinesSql(),
    "ml27_ndcg_eval" -> graft.ml.RankingMetrics.ndcgAtKSql(
      graft.sim.Similarity.bruteForceTopKSql(5, "vec_id < 20"), 5),
    "ml15_linear_shap" -> graft.ml.LinearShap.sql(
      """(SELECT user_id AS id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS DECIMAL(18,0)) AS x1,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS DECIMAL(18,0)) AS x2,
        |  CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))),
        |    CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |  FROM events GROUP BY 1)""".stripMargin.replace('\n', ' '),
      "id % 50 = 3"),
    "ml3_auc" ->
      s"""WITH by_score AS (
         |  SELECT score, count(*) AS n, sum(label) AS p
         |  FROM $scoredEmbeddingsSql GROUP BY 1),
         |cum AS (SELECT score, n, p, n - p AS neg,
         |    sum(n - p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
         |      - (n - p) AS neg_below
         |  FROM by_score)
         |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |  CAST(sum(neg) AS BIGINT) AS n_neg,
         |  count(*) AS n_scores,
         |  CAST(2 * sum(p * neg_below) + sum(p * neg) AS DOUBLE)
         |    / CAST(2 * sum(p) * sum(neg) AS DOUBLE) AS auc
         |FROM cum""".stripMargin.replace('\n', ' '),
    "ml5_calibration" ->
      s"""WITH b AS (
         |  SELECT CAST(least(9, greatest(0,
         |      floor((score - CAST('-0.5' AS DOUBLE))
         |        / CAST('0.1' AS DOUBLE)))) AS INT) AS bin,
         |    label, score
         |  FROM $scoredEmbeddingsSql)
         |SELECT bin,
         |  CAST('-0.5' AS DOUBLE) + bin * CAST('0.1' AS DOUBLE) AS bin_lo,
         |  count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos,
         |  CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS pos_rate,
         |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*)
         |    AS mean_score
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin.replace('\n', ' '),
    "ml4_confusion" ->
      s"""WITH c AS (SELECT
         |  sum(CASE WHEN label = 1 AND score >= 0.0 THEN 1 ELSE 0 END)
         |    AS tp,
         |  sum(CASE WHEN label = 0 AND score >= 0.0 THEN 1 ELSE 0 END)
         |    AS fp,
         |  sum(CASE WHEN label = 0 AND score < 0.0 THEN 1 ELSE 0 END)
         |    AS tn,
         |  sum(CASE WHEN label = 1 AND score < 0.0 THEN 1 ELSE 0 END)
         |    AS fn
         |  FROM $scoredEmbeddingsSql)
         |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
         |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE)
         |    AS accuracy,
         |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
         |  CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
         |  CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
         |FROM c""".stripMargin.replace('\n', ' '),
    "x33_unpivot" -> withPipeline(
      s"""SELECT location_id, datetime, pollutant, value FROM (
         |  SELECT location_id, datetime, $pollutantSql FROM gold)
         |UNPIVOT (value FOR pollutant IN
         |  (${Features.pollutants.mkString(", ")}))
         |ORDER BY location_id, datetime, pollutant"""
        .stripMargin.replace('\n', ' ')),
    "r7_country_encoding" -> withPipeline(
      """SELECT country,
        |  CAST(dense_rank() OVER (ORDER BY country) - 1 AS INT)
        |    AS country_encoded
        |FROM (SELECT DISTINCT country FROM gold)
        |ORDER BY country""".stripMargin.replace('\n', ' ')),
    "ml_feature_matrix" -> withPipeline(
      s"""SELECT location_id, datetime,
         |  CAST(hour(datetime) AS INT) AS hour,
         |  CAST(isodow(datetime) - 1 AS INT) AS day_of_week,
         |  CAST(month(datetime) AS INT) AS month_num,
         |  CAST(dayofyear(datetime) AS INT) AS day_of_year,
         |  isodow(datetime) - 1 >= 5 AS is_weekend,
         |  lag(aqi, 1) OVER w AS aqi_lag_1h,
         |  lag(aqi, 24) OVER w AS aqi_lag_24h,
         |  lag(aqi, 168) OVER w AS aqi_lag_168h,
         |  round(avg(aqi) OVER w7, 4) AS aqi_mean_7d,
         |  round(stddev_samp(aqi) OVER w7, 4) AS aqi_std_7d,
         |  max(aqi) OVER w7 AS aqi_max_7d,
         |  min(aqi) OVER w7 AS aqi_min_7d,
         |  round(avg(aqi) OVER w30, 4) AS aqi_mean_30d,
         |  CAST(dense_rank() OVER (ORDER BY country) - 1 AS INT)
         |    AS country_encoded,
         |  latitude, longitude, $pollutantSql, aqi,
         |  lead(aqi, 1) OVER w AS aqi_next
         |FROM gold
         |WINDOW
         |  w AS (PARTITION BY location_id ORDER BY datetime),
         |  w7 AS (PARTITION BY location_id ORDER BY datetime
         |    ROWS BETWEEN 167 PRECEDING AND CURRENT ROW),
         |  w30 AS (PARTITION BY location_id ORDER BY datetime
         |    ROWS BETWEEN 719 PRECEDING AND CURRENT ROW)
         |QUALIFY aqi_next IS NOT NULL
         |ORDER BY location_id, datetime""".stripMargin.replace('\n', ' ')),
    "ml_infer_features" -> withPipeline(
      s""", ao AS (
         |  SELECT date_trunc('hour', max(datetime)) AS as_of FROM gold),
         |latest AS (SELECT * FROM (
         |  SELECT g.*, row_number() OVER (
         |    PARTITION BY location_id ORDER BY datetime DESC) AS rn
         |  FROM gold g) WHERE rn = 1),
         |lags AS (
         |  SELECT location_id,
         |    max(CASE WHEN abs(epoch_us(date_trunc('hour', datetime))
         |      - (epoch_us(as_of) - 3600000000)) <= 3600000000
         |      THEN aqi END) AS lk_1,
         |    max(CASE WHEN abs(epoch_us(date_trunc('hour', datetime))
         |      - (epoch_us(as_of) - 86400000000)) <= 3600000000
         |      THEN aqi END) AS lk_24,
         |    max(CASE WHEN abs(epoch_us(date_trunc('hour', datetime))
         |      - (epoch_us(as_of) - 604800000000)) <= 3600000000
         |      THEN aqi END) AS lk_168
         |  FROM gold, ao GROUP BY location_id),
         |enc AS (
         |  SELECT country, CAST(dense_rank() OVER (ORDER BY country) - 1
         |    AS INT) AS country_encoded
         |  FROM (SELECT DISTINCT country FROM gold))
         |SELECT l.location_id, ao.as_of AS datetime,
         |  CAST(hour(ao.as_of) AS INT) AS hour,
         |  CAST(isodow(ao.as_of) - 1 AS INT) AS day_of_week,
         |  CAST(month(ao.as_of) AS INT) AS month_num,
         |  CAST(dayofyear(ao.as_of) AS INT) AS day_of_year,
         |  isodow(ao.as_of) - 1 >= 5 AS is_weekend,
         |  coalesce(lg.lk_1, l.aqi) AS aqi_lag_1h,
         |  coalesce(lg.lk_24, l.aqi) AS aqi_lag_24h,
         |  coalesce(lg.lk_168, l.aqi) AS aqi_lag_168h,
         |  l.aqi AS aqi_mean_7d, CAST(0.0 AS DOUBLE) AS aqi_std_7d,
         |  l.aqi AS aqi_max_7d, l.aqi AS aqi_min_7d,
         |  l.aqi AS aqi_mean_30d,
         |  coalesce(e.country_encoded, 0) AS country_encoded,
         |  l.latitude, l.longitude, $pollutantSql, l.aqi
         |FROM latest l CROSS JOIN ao
         |LEFT JOIN lags lg ON lg.location_id = l.location_id
         |LEFT JOIN enc e ON e.country = l.country
         |ORDER BY l.location_id""".stripMargin.replace('\n', ' ')),
    "ml8_lift_table" ->
      """WITH per AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS n_clicks,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY 1),
        |dec AS (SELECT user_id, converted,
        |    CAST(ntile(10) OVER (ORDER BY n_clicks DESC, user_id)
        |      AS INT) AS decile
        |  FROM per),
        |t AS (SELECT count(*) AS t_users,
        |    CAST(sum(converted) AS BIGINT) AS t_conv FROM dec),
        |g AS (SELECT decile, count(*) AS n_users,
        |    CAST(sum(converted) AS BIGINT) AS n_conv
        |  FROM dec GROUP BY 1)
        |SELECT decile, n_users, n_conv,
        |  CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
        |  CAST(CAST(sum(n_conv) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
        |    / CAST(t_conv AS DOUBLE) AS cum_capture,
        |  (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)) /
        |    (CAST(t_conv AS DOUBLE) / CAST(t_users AS DOUBLE)) AS lift
        |FROM g CROSS JOIN t ORDER BY decile"""
        .stripMargin.replace('\n', ' '),
    "ml9_kfold_cv" -> withPipeline(
      """SELECT CAST(fold AS INT) AS fold,
        |  CAST(count(DISTINCT location_id) AS BIGINT) AS n_stations,
        |  count(*) AS n_rows,
        |  sqrt(CAST(sum(CAST((aqi - pred) * (aqi - pred)
        |    AS DECIMAL(24,6))) AS DOUBLE) / count(*))
        |    AS rmse_persistence
        |FROM (SELECT location_id, aqi, pred,
        |    CASE WHEN substr(md5(CAST(location_id AS VARCHAR)), 1, 4)
        |        < '3333' THEN 0
        |      WHEN substr(md5(CAST(location_id AS VARCHAR)), 1, 4)
        |        < '6666' THEN 1
        |      WHEN substr(md5(CAST(location_id AS VARCHAR)), 1, 4)
        |        < '9999' THEN 2
        |      WHEN substr(md5(CAST(location_id AS VARCHAR)), 1, 4)
        |        < 'cccc' THEN 3 ELSE 4 END AS fold
        |  FROM (SELECT location_id, datetime, aqi,
        |      lag(aqi) OVER (PARTITION BY location_id
        |        ORDER BY datetime) AS pred
        |    FROM gold)
        |  WHERE pred IS NOT NULL)
        |GROUP BY 1 ORDER BY fold""".stripMargin.replace('\n', ' ')),
    "w12_ewma" -> {
      val L = 12
      def tapSql(i: Int) =
        if (i == 0) "aqi" else s"lag(aqi, $i) OVER w"
      val num = (0 until L).map { i =>
        s"coalesce(CAST(round(${tapSql(i)} * ${1L << (L - 1 - i)}, 6)" +
          s" AS DECIMAL(24,6)), CAST('0' AS DECIMAL(24,6)))"
      }.mkString(" + ")
      val den = (0 until L).map { i =>
        s"CASE WHEN ${tapSql(i)} IS NOT NULL" +
          s" THEN ${1L << (L - 1 - i)} ELSE 0 END"
      }.mkString(" + ")
      withPipeline(
        s"""SELECT location_id, datetime, aqi,
           |  CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS ewma
           |FROM gold WHERE aqi IS NOT NULL
           |WINDOW w AS (PARTITION BY location_id ORDER BY datetime)
           |ORDER BY location_id, datetime""".stripMargin
          .replace('\n', ' '))
    },
    "ml7_logistic_irls" -> graft.ml.LogisticIrls.irlsSql(
      """SELECT value / 100 AS x,
        |  CASE WHEN event_type = 'purchase' THEN CAST('1' AS DOUBLE)
        |    ELSE CAST('0' AS DOUBLE) END AS y
        |FROM events WHERE value IS NOT NULL""".stripMargin
        .replace('\n', ' '),
      iters = 3)
  )
}
