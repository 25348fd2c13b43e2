package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Aqi

/** Maps the harness `events` table onto the reference's wire record
  * (FIXTURES.md §B): ts→datetime, user_id→location_id, event_type→parameter,
  * value→concentration. Station attributes (name, country, lat/lon) are
  * derived deterministically from user_id so the DuckDB oracle can reproduce
  * them; `error` events map to an unknown pollutant, exercising the
  * null-AQI path (SURVEY.md §2.10-3).
  *
  * Every derivation has an SQL twin ([[wireSql]]) with the identical
  * expression tree, so double arithmetic is bit-equal across engines.
  */
object EventsAdapter {

  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Canonical µs-since-epoch long for `events.ts`, whatever physical
    * type the testdata parquet carries — the column has drifted across
    * harness rounds: TIMESTAMP(NANOS) surfaced as LongType nanos (under
    * `spark.sql.legacy.parquet.nanosAsLong`), plain TIMESTAMP (LTZ), and
    * `timestamp[us]` read as TIMESTAMP_NTZ. Normalizing ONCE here is the
    * contract every query goes through (TsContractSpec pins it against
    * fixture files of all three types).
    *
    * The nanos leg uses integer DIV (double division would round ~1.7e18
    * ns epochs); the NTZ leg casts through TimestampType, which is
    * µs-exact because every graft session pins
    * `spark.sql.session.timeZone=UTC` (Verify/Bench/TestSpark). */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000")
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType    => unix_micros(col("ts"))
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type $other")
  }

  /** [[tsMicros]] surfaced as a TimestampType column. */
  def tsTimestamp(df: DataFrame): Column = timestamp_micros(tsMicros(df))

  val countries: Vector[String] =
    Vector("ID", "KH", "LA", "MM", "MY", "PH", "SG", "TH", "VN")

  /** click→pm25 view→pm10 purchase→o3 signup→so2; error & anything else →
    * unknown (R1 yields null). co/no2 are covered by unit tests. */
  val paramByType: Seq[(String, String)] = Seq(
    "click" -> "pm25", "view" -> "pm10", "purchase" -> "o3", "signup" -> "so2")

  /** events → 13-column wire record (+ event_id kept as a deterministic
    * row key for ordered comparisons; dropped by the Silver projection).
    *
    * Derived columns are bound LAYER BY LAYER (separate projections), not
    * inlined: the AQI when-chain references `value_standard` ~180 times —
    * inlining the unit-conversion CASE into each reference explodes the
    * Catalyst tree (and the SQL twin) exponentially. CollapseProject keeps
    * multi-referenced non-cheap expressions bound, so the plan stays
    * linear. */
  def wire(events: DataFrame): DataFrame = {
    val param = paramByType
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, (t, p)) => when(col("event_type") === t, lit(p))
        case (acc, (t, p))  => acc.when(col("event_type") === t, lit(p))
      }
      .otherwise(lit("unknown"))
    val country = countries.zipWithIndex
      .foldLeft(null.asInstanceOf[Column]) {
        case (null, (c, i)) => when(col("user_id") % 9 === i, lit(c))
        case (acc, (c, i))  => acc.when(col("user_id") % 9 === i, lit(c))
      }
    val dt = tsTimestamp(events)
    events
      .select(
        col("event_id"),
        dt.as("datetime"),
        col("user_id").as("location_id"),
        concat(lit("station_"), col("user_id").cast("string"))
          .as("location_name"),
        country.as("country"),
        (lit(-10.0) + (col("user_id") % 37).cast("double") * lit(1.5))
          .as("latitude"),
        (lit(90.0) + (col("user_id") % 53).cast("double") * lit(0.75))
          .as("longitude"),
        param.as("parameter"),
        col("value"),
        col("props"))
      .withColumn("unit",
        when(col("parameter") === "unknown", lit("count"))
          .otherwise(lit("µg/m³")))
      .withColumn("value_standard",
        Aqi.toStandard(col("parameter"), col("unit"), col("value")))
      .withColumn("aqi", Aqi.aqi(col("parameter"), col("value_standard")))
      .withColumn("aqi_category", Aqi.category(col("aqi")))
      .withColumn("ingestion_timestamp",
        to_timestamp(lit("2024-02-01 00:00:00")))
      .select(
        col("event_id"), col("datetime"), col("location_id"),
        col("location_name"), col("country"), col("latitude"),
        col("longitude"), col("parameter"), col("value"),
        col("value_standard"), col("unit"), col("aqi"),
        col("aqi_category"), col("ingestion_timestamp"), col("props"))
  }

  /** DuckDB twin of [[wire]] as a CTE body over table `events` — same
    * layered structure (nested subqueries bind parameter / unit /
    * value_standard / aqi once each; inlining would blow the SQL up to
    * megabytes). CAST(ts AS TIMESTAMP) truncates ns→µs exactly as Spark's
    * parquet reader does, keeping timestamps comparable. */
  def wireSql: String = {
    val param = paramByType
      .map { case (t, p) => s"WHEN event_type = '$t' THEN '$p'" }
      .mkString("(CASE ", " ", " ELSE 'unknown' END)")
    val country = countries.zipWithIndex
      .map { case (c, i) => s"WHEN user_id % 9 = $i THEN '$c'" }
      .mkString("(CASE ", " ", " ELSE NULL END)")
    val base =
      s"""SELECT
         |  event_id,
         |  CAST(ts AS TIMESTAMP) AS datetime,
         |  user_id AS location_id,
         |  'station_' || CAST(user_id AS VARCHAR) AS location_name,
         |  $country AS country,
         |  CAST('-10.0' AS DOUBLE) + CAST(user_id % 37 AS DOUBLE)
         |    * CAST('1.5' AS DOUBLE) AS latitude,
         |  CAST('90.0' AS DOUBLE) + CAST(user_id % 53 AS DOUBLE)
         |    * CAST('0.75' AS DOUBLE) AS longitude,
         |  $param AS parameter,
         |  value,
         |  props
         |FROM events""".stripMargin.replace('\n', ' ')
    val withUnit = s"SELECT *, (CASE WHEN parameter = 'unknown' " +
      s"THEN 'count' ELSE 'µg/m³' END) AS unit FROM ($base)"
    val withStd = s"SELECT *, " +
      s"${Aqi.toStandardSql("parameter", "unit", "value")} AS value_standard " +
      s"FROM ($withUnit)"
    val withAqi = s"SELECT *, " +
      s"${Aqi.aqiSql("parameter", "value_standard")} AS aqi FROM ($withStd)"
    s"""SELECT event_id, datetime, location_id, location_name, country,
       |  latitude, longitude, parameter, value, value_standard, unit, aqi,
       |  ${Aqi.categorySql("aqi")} AS aqi_category,
       |  TIMESTAMP '2024-02-01 00:00:00' AS ingestion_timestamp, props
       |FROM ($withAqi)""".stripMargin.replace('\n', ' ')
  }
}
