package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Queries
import graft.expr.Aqi
import graft.queries.PipelineQueries.{bronze, gold, silver, withPipeline}

/** Registry + DuckDB oracle twins for the OLAP surface
  * (SURVEY.md §2.4 A3-A12, §2.5 W5-W6, §2.6 O1/O3). */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a3_layer_stats" -> ((s, d) => Queries.layerStats(silver(s, d))),
    "a3_approx_distinct" -> ((s, d) => Queries.layerStatsApprox(silver(s, d))),
    "a4_country_stats" -> ((s, d) => Queries.countryStats(gold(s, d))),
    "a5_data_quality" -> ((s, d) => Queries.dataQuality(bronze(s, d))),
    "a6_yearly_counts" -> ((s, d) => Queries.yearlyCounts(silver(s, d))),
    "a7_param_distribution" -> ((s, d) =>
      Queries.parameterDistribution(silver(s, d))),
    "a8_station_inventory" -> ((s, d) =>
      Queries.stationInventory(silver(s, d))),
    "a9_alive_stations" -> ((s, d) => Queries.aliveStations(silver(s, d))),
    "a10_country_live" -> ((s, d) => Queries.countryLive(silver(s, d))),
    "a11_station_max_aqi" -> ((s, d) => Queries.stationMaxAqi(silver(s, d))),
    "a12_param_sets" -> ((s, d) => Queries.parameterSets(gold(s, d))),
    "w5_latest_topn" -> ((s, d) => Queries.latestTopN(silver(s, d))),
    "w6_latest_per_location" -> ((s, d) =>
      Queries.latestPerLocation(silver(s, d))),
    "o1_export_sorted" -> ((s, d) => Queries.exportSorted(silver(s, d))),
    // R4: serving-layer recommendation payload (struct → flattened)
    "r4_recommendation" -> ((s, d) => {
      val st = Queries.stationMaxAqi(silver(s, d))
        .withColumn("rec", Aqi.recommendation(org.apache.spark.sql.functions.col("aqi")))
      st.select(
        org.apache.spark.sql.functions.col("location_id"),
        org.apache.spark.sql.functions.col("aqi"),
        org.apache.spark.sql.functions.col("aqi_category"),
        org.apache.spark.sql.functions.col("rec.message").as("message"),
        org.apache.spark.sql.functions.col("rec.icon").as("icon"),
        org.apache.spark.sql.functions.col("rec.color").as("color"))
        .orderBy("location_id")
    }),
    // P10: date/country slice (pandas df[dt>=..][country.isin(..)] analog)
    "p10_slice" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      silver(s, d)
        .filter(col("datetime") >= lit("2024-01-10 00:00:00") &&
          col("datetime") < lit("2024-01-20 00:00:00") &&
          col("country").isin("VN", "TH", "KH"))
        .groupBy(col("country"))
        .agg(count(lit(1)).as("n_records"),
          min(col("datetime")).as("min_dt"),
          max(col("datetime")).as("max_dt"))
        .orderBy("country")
    }),
    // P11: null imputation (load_to_clickhouse.py:87-96 analog) via na.fill
    "p11_impute" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      gold(s, d)
        .na.fill(Map("aqi" -> 0.0, "aqi_category" -> ""))
        .select(col("location_id"), col("datetime"), col("aqi"),
          col("aqi_category"),
          coalesce(col("parameters"), array()).as("params"))
        .groupBy(col("aqi_category"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("aqi")), 4).as("avg_aqi"),
          sum(size(col("params"))).as("n_values"))
        .orderBy("aqi_category")
    })
  )

  // `a3_approx_distinct` is deliberately omitted from the oracle: HLL
  // estimates are engine-specific → rows-only check.
  val oracle: Map[String, String] = Map(
    "a3_layer_stats" -> withPipeline(
      """SELECT count(*) AS n_records, min(datetime) AS min_dt,
        |  max(datetime) AS max_dt,
        |  count(DISTINCT location_id) AS n_locations,
        |  count(DISTINCT country) AS n_countries
        |FROM silver""".stripMargin.replace('\n', ' ')),
    "a4_country_stats" -> withPipeline(
      """SELECT country, count(*) AS n_records,
        |  round(avg(aqi), 4) AS avg_aqi, max(aqi) AS max_aqi,
        |  min(aqi) AS min_aqi, round(stddev_pop(aqi), 4) AS std_aqi
        |FROM gold GROUP BY country
        |ORDER BY avg_aqi DESC, country""".stripMargin.replace('\n', ' ')),
    "a5_data_quality" -> withPipeline(
      """SELECT count(*) AS n_records,
        |  count(*) FILTER (WHERE aqi IS NULL) AS null_aqi,
        |  count(*) FILTER (WHERE value IS NULL) AS null_value,
        |  count(*) FILTER (WHERE value < 0) AS negative_value,
        |  count(*) FILTER (WHERE country IS NULL) AS null_country
        |FROM bronze""".stripMargin.replace('\n', ' ')),
    "a6_yearly_counts" -> withPipeline(
      """SELECT CAST(year(datetime) AS INT) AS yr, country,
        |  count(*) AS n_records
        |FROM silver GROUP BY 1, 2
        |ORDER BY yr, country""".stripMargin.replace('\n', ' ')),
    "a7_param_distribution" -> withPipeline(
      """SELECT parameter, count(*) AS n_records,
        |  round(avg(value), 4) AS avg_value, max(value) AS max_value,
        |  min(value) AS min_value
        |FROM silver GROUP BY parameter
        |ORDER BY parameter""".stripMargin.replace('\n', ' ')),
    "a8_station_inventory" -> withPipeline(
      """SELECT location_id, location_name, country, count(*) AS n_records,
        |  min(datetime) AS first_dt, max(datetime) AS last_dt
        |FROM silver GROUP BY 1, 2, 3
        |ORDER BY location_id""".stripMargin.replace('\n', ' ')),
    "a9_alive_stations" -> withPipeline(
      """SELECT location_id, max(datetime) AS last_dt
        |FROM silver GROUP BY 1
        |HAVING max(datetime) >=
        |  (SELECT max(datetime) - INTERVAL 7 DAY FROM silver)
        |ORDER BY location_id""".stripMargin.replace('\n', ' ')),
    "a10_country_live" -> withPipeline(
      """SELECT *, max(max_aqi) OVER (PARTITION BY country) AS country_aqi,
        |  """.stripMargin.replace('\n', ' ') +
      Aqi.categorySql("max(max_aqi) OVER (PARTITION BY country)") +
      """ AS country_category FROM (
        |  SELECT country, parameter,
        |    count(DISTINCT location_id) AS n_stations,
        |    round(avg(value), 4) AS avg_value, max(value) AS max_value,
        |    min(value) AS min_value, round(avg(aqi), 4) AS avg_aqi,
        |    max(aqi) AS max_aqi
        |  FROM silver GROUP BY 1, 2)
        |ORDER BY country, parameter""".stripMargin.replace('\n', ' ')),
    "a11_station_max_aqi" -> withPipeline(
      "SELECT location_id, max(aqi) AS aqi, " +
        Aqi.categorySql("max(aqi)") + " AS aqi_category " +
        "FROM silver GROUP BY 1 ORDER BY location_id"),
    "a12_param_sets" -> withPipeline(
      """SELECT location_id,
        |  array_to_string(list(DISTINCT p ORDER BY p), ',') AS parameters
        |FROM (SELECT location_id, unnest(parameters) AS p FROM gold)
        |GROUP BY 1 ORDER BY location_id""".stripMargin.replace('\n', ' ')),
    "w5_latest_topn" -> withPipeline(
      """SELECT datetime, location_id, parameter, value, aqi
        |FROM silver
        |ORDER BY datetime DESC, location_id, parameter, value
        |LIMIT 10""".stripMargin.replace('\n', ' ')),
    "w6_latest_per_location" -> withPipeline(
      """SELECT location_id, datetime, parameter, value, aqi
        |FROM (SELECT location_id, datetime, parameter, value, aqi,
        |    row_number() OVER (PARTITION BY location_id
        |      ORDER BY datetime DESC, parameter, value) AS rn
        |  FROM silver)
        |WHERE rn = 1 ORDER BY location_id""".stripMargin.replace('\n', ' ')),
    "o1_export_sorted" -> withPipeline(
      """SELECT country, datetime, location_id, parameter, value, aqi,
        |  aqi_category
        |FROM silver
        |ORDER BY country, datetime, location_id, parameter, value"""
        .stripMargin.replace('\n', ' ')),
    "r4_recommendation" -> withPipeline(
      "SELECT location_id, max(aqi) AS aqi, " +
        Aqi.categorySql("max(aqi)") + " AS aqi_category, " +
        Aqi.recommendationSql("max(aqi)", 0) + " AS message, " +
        Aqi.recommendationSql("max(aqi)", 1) + " AS icon, " +
        Aqi.recommendationSql("max(aqi)", 2) + " AS color " +
        "FROM silver GROUP BY 1 ORDER BY location_id"),
    "p10_slice" -> withPipeline(
      """SELECT country, count(*) AS n_records, min(datetime) AS min_dt,
        |  max(datetime) AS max_dt
        |FROM silver
        |WHERE datetime >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND datetime < TIMESTAMP '2024-01-20 00:00:00'
        |  AND country IN ('VN', 'TH', 'KH')
        |GROUP BY 1 ORDER BY country""".stripMargin.replace('\n', ' ')),
    "p11_impute" -> withPipeline(
      """SELECT coalesce(aqi_category, '') AS aqi_category,
        |  count(*) AS n_rows,
        |  round(avg(coalesce(aqi, 0.0)), 4) AS avg_aqi,
        |  CAST(sum(len(coalesce(parameters, []))) AS BIGINT) AS n_values
        |FROM gold GROUP BY 1 ORDER BY aqi_category"""
        .stripMargin.replace('\n', ' '))
  )
}
