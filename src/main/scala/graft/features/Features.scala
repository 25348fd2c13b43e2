package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature engineering (SURVEY.md §1.5, §2.5, §2.7 R5-R7) — the
  * reference builds these in pandas (ml_training/data_loader.py:121-175);
  * here they are Window transforms, so the feature matrix is computed
  * distributed instead of on a single driver.
  *
  * Semantics pinned to pandas (SURVEY.md §7.4-2):
  *  - all windows are ROW-count frames (`rowsBetween`), not time ranges —
  *    gaps in the hourly grid shift the lookback horizon, as in the
  *    reference (quirk §2.10-4);
  *  - rolling std is the SAMPLE std (ddof=1), null for 1-row windows;
  *  - `min_periods=1` ⇒ aggregates over however many rows are available;
  *  - day_of_week is Mon=0 (pandas), not Spark's Sun=1 `dayofweek`.
  *
  * Scale: each Window is partitioned by location_id — one shuffle shared
  * by all lag/rolling features (Catalyst collapses same-spec windows into
  * a single Window operator), state bounded by the frame length.
  */
object Features {

  private val byLocation = Window.partitionBy(col("location_id"))
    .orderBy(col("datetime"))

  /** R5: calendar features (data_loader.py:134-138). `weekday()` is
    * Spark's Mon=0 function, matching pandas `dt.dayofweek`. */
  def timeFeatures(gold: DataFrame): DataFrame =
    gold
      .withColumn("hour", hour(col("datetime")))
      .withColumn("day_of_week", weekday(col("datetime")))
      .withColumn("month_num", month(col("datetime")))
      .withColumn("day_of_year", dayofyear(col("datetime")))
      .withColumn("is_weekend", weekday(col("datetime")) >= 5)

  /** W1: AQI lags at 1/24/168 rows per station (data_loader.py:141-143). */
  def lagFeatures(gold: DataFrame): DataFrame =
    Seq(1, 24, 168).foldLeft(gold) { (df, k) =>
      df.withColumn(s"aqi_lag_${k}h", lag(col("aqi"), k).over(byLocation))
    }

  /** W2: the training target — next-hour AQI (lead 1 row), dropping each
    * station's last row (train_lightgbm.py:167-171). */
  def withTarget(gold: DataFrame): DataFrame =
    gold
      .withColumn("aqi_next", lead(col("aqi"), 1).over(byLocation))
      .filter(col("aqi_next").isNotNull)

  /** W3+W4: rolling stats over 168-row (≈7 d) and 720-row (≈30 d) frames
    * (data_loader.py:146-160). Std is stddev_samp (pandas ddof=1). */
  def rollingFeatures(gold: DataFrame): DataFrame = {
    val w7 = byLocation.rowsBetween(-167, 0)
    val w30 = byLocation.rowsBetween(-719, 0)
    gold
      .withColumn("aqi_mean_7d", avg(col("aqi")).over(w7))
      .withColumn("aqi_std_7d", stddev_samp(col("aqi")).over(w7))
      .withColumn("aqi_max_7d", max(col("aqi")).over(w7))
      .withColumn("aqi_min_7d", min(col("aqi")).over(w7))
      .withColumn("aqi_mean_30d", avg(col("aqi")).over(w30))
  }

  /** R6: un-pivot the Gold parallel arrays into per-pollutant columns,
    * missing → 0.0 (data_loader.py:166-173 + 177-194). Spark's
    * `array_position` returns 0 when absent (and element_at(0) throws),
    * so the lookup is guarded by pos > 0. */
  val pollutants: Seq[String] = Seq("pm25", "pm10", "o3", "co", "so2", "no2")

  def pollutantColumns(gold: DataFrame): DataFrame =
    pollutants.foldLeft(gold) { (df, p) =>
      val pos = array_position(col("parameters"), p)
      df.withColumn(p,
        coalesce(
          when(pos > 0, element_at(col("values"), pos.cast("int"))),
          lit(0.0)))
    }

  /** R7: deterministic label-encoding of country (alphabetical → 0..n−1),
    * matching sklearn LabelEncoder (data_loader.py:47,163).
    * Scale path: aggregate to the tiny distinct set FIRST, window over
    * that (9 rows), broadcast-join back — never a global window over the
    * fact table. */
  def countryEncoding(anyLayer: DataFrame): DataFrame = {
    val distinctCountries = anyLayer.select(col("country")).distinct()
    distinctCountries
      .withColumn("country_encoded",
        (dense_rank().over(Window.orderBy(col("country"))) - 1).cast("int"))
  }

  def withCountryEncoded(gold: DataFrame): DataFrame =
    gold.join(broadcast(countryEncoding(gold)), Seq("country"), "left")

  /** Serving-time feature derivation — the engine twin of the
    * reference's single-station inference path (app.py:148-229
    * create_features_for_prediction + :247-398 fetch_lag_features):
    * for EVERY station's latest snapshot, the same 22 features the model
    * trained on, with the serving degradations the reference applies:
    *
    *  - time features come from "now" (here: the dataset's latest closed
    *    hour, a deterministic stand-in for wall clock);
    *  - lag features look up the hours at now−1/−24/−168 with the
    *    reference's ±1 h tolerance, taking max(aqi) across matches
    *    (app.py:386-388 maxes across sensors), falling back to the
    *    current AQI when no measurement exists (app.py:207-219);
    *  - rolling stats degrade to the current AQI with std 0 — the
    *    min_periods=1 single-point behavior (app.py:221-227);
    *  - unknown countries encode to 0 (app.py:196-198).
    *
    * Scale shape: one window shuffle for the latest-row pick, one hash
    * aggregation for all three lag lookups (conditional max — no
    * per-lag join), broadcast joins for the 1-row as-of and the tiny
    * encoder table. The reference serves one station per HTTP call; this
    * derives features for all stations in one distributed pass. */
  def inferenceFeatures(gold: DataFrame): DataFrame = {
    val usPerHour = 3600L * 1000000L
    val asOf = broadcast(
      gold.agg(date_trunc("hour", max(col("datetime"))).as("as_of")))
    val w = Window.partitionBy(col("location_id"))
      .orderBy(col("datetime").desc)
    val latest = pollutantColumns(
      gold.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn"))
    val hourly = gold.crossJoin(asOf)
      .withColumn("h_us", unix_micros(date_trunc("hour", col("datetime"))))
      .withColumn("as_us", unix_micros(col("as_of")))
    def lagMax(k: Int) = max(when(
      abs(col("h_us") - (col("as_us") - lit(k * usPerHour))) <= usPerHour,
      col("aqi")))
    val lags = hourly.groupBy(col("location_id")).agg(
      lagMax(1).as("lk_1"), lagMax(24).as("lk_24"),
      lagMax(168).as("lk_168"))
    latest.crossJoin(asOf)
      .join(lags, Seq("location_id"), "left")
      .join(broadcast(countryEncoding(gold)), Seq("country"), "left")
      .select(Seq(
        col("location_id"),
        col("as_of").as("datetime"),
        hour(col("as_of")).as("hour"),
        weekday(col("as_of")).as("day_of_week"),
        month(col("as_of")).as("month_num"),
        dayofyear(col("as_of")).as("day_of_year"),
        (weekday(col("as_of")) >= 5).as("is_weekend"),
        coalesce(col("lk_1"), col("aqi")).as("aqi_lag_1h"),
        coalesce(col("lk_24"), col("aqi")).as("aqi_lag_24h"),
        coalesce(col("lk_168"), col("aqi")).as("aqi_lag_168h"),
        col("aqi").as("aqi_mean_7d"),
        lit(0.0).as("aqi_std_7d"),
        col("aqi").as("aqi_max_7d"),
        col("aqi").as("aqi_min_7d"),
        col("aqi").as("aqi_mean_30d"),
        coalesce(col("country_encoded"), lit(0)).as("country_encoded"),
        col("latitude"), col("longitude")) ++
        pollutants.map(col) :+ col("aqi"): _*)
  }

  /** The full 22-feature matrix + target (ML_TRAINING.md:57-148, A4 fixture
    * in FIXTURES.md). One shuffle for all window features + one broadcast
    * join for the encoding.
    *
    * The encoder's distinct-country set comes from the INPUT gold frame
    * (optionally an even earlier layer via `encodeFrom` — country is
    * untouched by the gold aggregation, so silver gives the same set
    * without re-running the roll-up on the encoding branch). Encoding from
    * the post-window matrix would recompute the whole window pipeline just
    * to list ~10 countries, and the reference's LabelEncoder fits on the
    * loaded frame (data_loader.py:47,163), not the feature matrix. */
  def featureMatrix(gold: DataFrame,
      encodeFrom: Option[DataFrame] = None): DataFrame = {
    val staged = withTarget(
      rollingFeatures(lagFeatures(timeFeatures(pollutantColumns(gold)))))
    staged.join(broadcast(countryEncoding(encodeFrom.getOrElse(gold))),
        Seq("country"), "left")
      .select(
        col("location_id"), col("datetime"),
        col("hour"), col("day_of_week"), col("month_num"),
        col("day_of_year"), col("is_weekend"),
        col("aqi_lag_1h"), col("aqi_lag_24h"), col("aqi_lag_168h"),
        col("aqi_mean_7d"), col("aqi_std_7d"), col("aqi_max_7d"),
        col("aqi_min_7d"), col("aqi_mean_30d"),
        col("country_encoded"), col("latitude"), col("longitude"),
        col("pm25"), col("pm10"), col("o3"), col("co"), col("so2"),
        col("no2"),
        col("aqi"), col("aqi_next"))
  }
}
