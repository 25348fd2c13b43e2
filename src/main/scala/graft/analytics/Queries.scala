package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.Aqi

/** The OLAP surface (SURVEY.md §2.4 A3-A12, §2.5 W5-W6, §2.6 O1-O3) —
  * the reference's ClickHouse analytics re-expressed as DataFrame
  * transforms over the Silver/Gold tables.
  *
  * Scale notes: every aggregation here is a single hash-aggregate with
  * map-side partials; `countDistinct` expands to a two-phase aggregate
  * (scalable); `approx_count_distinct` (HLL) is the preferred form at
  * 100 TB and is exposed alongside. Global top-N uses TakeOrderedAndProject
  * (per-partition heap + driver merge of N rows — no full sort). The
  * "alive stations" pattern broadcasts a 1-row global aggregate instead of
  * a driver-side collect.
  */
object Queries {

  /** A3: layer statistics — record count, datetime range, distinct
    * stations/countries (clickhouse_queries.sql:9-32). */
  def layerStats(silver: DataFrame): DataFrame =
    silver.agg(
      count(lit(1)).as("n_records"),
      min(col("datetime")).as("min_dt"),
      max(col("datetime")).as("max_dt"),
      countDistinct(col("location_id")).as("n_locations"),
      countDistinct(col("country")).as("n_countries"))

  /** A3 at scale: HLL sketches instead of exact distinct. */
  def layerStatsApprox(silver: DataFrame): DataFrame =
    silver.agg(
      count(lit(1)).as("n_records"),
      approx_count_distinct(col("location_id")).as("n_locations"),
      approx_count_distinct(col("country")).as("n_countries"))

  /** A4: per-country AQI stats ordered by average — the reference's
    * flagship worked example (clickhouse_queries.sql:95-105,
    * README.md:289-300). */
  def countryStats(gold: DataFrame): DataFrame =
    gold.groupBy(col("country"))
      .agg(
        count(lit(1)).as("n_records"),
        round(avg(col("aqi")), 4).as("avg_aqi"),
        max(col("aqi")).as("max_aqi"),
        min(col("aqi")).as("min_aqi"),
        round(stddev_pop(col("aqi")), 4).as("std_aqi"))
      .orderBy(desc("avg_aqi"), col("country"))

  /** A5: data-quality conditional counts (clickhouse_queries.sql:112-125). */
  def dataQuality(bronze: DataFrame): DataFrame =
    bronze.agg(
      count(lit(1)).as("n_records"),
      count_if(col("aqi").isNull).as("null_aqi"),
      count_if(col("value").isNull).as("null_value"),
      count_if(col("value") < 0).as("negative_value"),
      count_if(col("country").isNull).as("null_country"))

  /** A6: per-year / country-year counts (clickhouse_queries.sql:131-146). */
  def yearlyCounts(silver: DataFrame): DataFrame =
    silver.groupBy(year(col("datetime")).as("yr"), col("country"))
      .agg(count(lit(1)).as("n_records"))
      .orderBy(col("yr"), col("country"))

  /** A7: per-parameter distribution (clickhouse_queries.sql:153-160). */
  def parameterDistribution(silver: DataFrame): DataFrame =
    silver.groupBy(col("parameter"))
      .agg(
        count(lit(1)).as("n_records"),
        round(avg(col("value")), 4).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"))
      .orderBy(col("parameter"))

  /** A8: station inventory (clickhouse_queries.sql:61-72). */
  def stationInventory(silver: DataFrame): DataFrame =
    silver.groupBy(col("location_id"), col("location_name"), col("country"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("datetime")).as("first_dt"),
        max(col("datetime")).as("last_dt"))
      .orderBy(col("location_id"))

  /** A9: alive-station detection — last report within 7 days of the global
    * maximum (check_countries.py:88-97). The global max is a 1-row
    * aggregate broadcast against the per-station aggregate — no
    * driver-side collect, scales to any station count. */
  def aliveStations(silver: DataFrame): DataFrame = {
    val perStation = silver.groupBy(col("location_id"))
      .agg(max(col("datetime")).as("last_dt"))
    val global = silver.agg(max(col("datetime")).as("global_max"))
    perStation
      .crossJoin(broadcast(global))
      .filter(col("last_dt") >= col("global_max") - expr("INTERVAL 7 DAY"))
      .select(col("location_id"), col("last_dt"))
      .orderBy(col("location_id"))
  }

  /** A10: country-level live aggregation — per-parameter stats plus the
    * overall country AQI (max across parameters) via a window over the
    * already-aggregated (small) frame (app.py:1009-1031). */
  def countryLive(silver: DataFrame): DataFrame = {
    val perParam = silver.groupBy(col("country"), col("parameter"))
      .agg(
        countDistinct(col("location_id")).as("n_stations"),
        round(avg(col("value")), 4).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        round(avg(col("aqi")), 4).as("avg_aqi"),
        max(col("aqi")).as("max_aqi"))
    val w = Window.partitionBy(col("country"))
    perParam
      .withColumn("country_aqi", max(col("max_aqi")).over(w))
      .withColumn("country_category", Aqi.category(col("country_aqi")))
      .orderBy(col("country"), col("parameter"))
  }

  /** A11: per-station overall AQI = max over its parameters, with the
    * category derived from that max (app.py:753-755, 987-989). */
  def stationMaxAqi(silver: DataFrame): DataFrame = {
    val maxAqi = max(col("aqi"))
    silver.groupBy(col("location_id"))
      .agg(maxAqi.as("aqi"), Aqi.category(maxAqi).as("aqi_category"))
      .orderBy(col("location_id"))
  }

  /** A12: distinct parameter set per station, from the Gold arrays —
    * explode → collect_set (check_countries.py:110-118). */
  def parameterSets(gold: DataFrame): DataFrame =
    gold.select(col("location_id"), explode(col("parameters")).as("p"))
      .groupBy(col("location_id"))
      .agg(array_join(sort_array(collect_set(col("p"))), ",").as("parameters"))
      .orderBy(col("location_id"))

  /** W5: top-N latest measurements (clickhouse_queries.sql:79-88).
    * Planned as TakeOrderedAndProject — no global sort. */
  def latestTopN(silver: DataFrame, n: Int = 10): DataFrame =
    silver
      .select(col("datetime"), col("location_id"), col("parameter"),
        col("value"), col("aqi"))
      .orderBy(desc("datetime"), col("location_id"), col("parameter"),
        col("value"))
      .limit(n)

  /** W6: latest record per location via row_number (check_countries.py:153). */
  def latestPerLocation(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("location_id"))
      .orderBy(desc("datetime"), col("parameter"), col("value"))
    silver
      .select(col("location_id"), col("datetime"), col("parameter"),
        col("value"), col("aqi"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("location_id"))
  }

  /** O1: globally-sorted export (README.md:429-447) — range-partitioned
    * sort, streams straight into the CSV/parquet writer at scale. */
  def exportSorted(silver: DataFrame): DataFrame =
    silver
      .select(col("country"), col("datetime"), col("location_id"),
        col("parameter"), col("value"), col("aqi"), col("aqi_category"))
      .orderBy(col("country"), col("datetime"), col("location_id"),
        col("parameter"), col("value"))
}
