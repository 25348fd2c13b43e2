package graft.model

import org.apache.spark.sql.types._

/** Schemas for the measurement pipeline.
  *
  * The wire record is the single logical entity of the engine — a pollutant
  * measurement (reference: spark/batch_processor.py:31-45, README.md:316-332).
  * It flows Bronze → Silver → Gold (medallion layers, SURVEY.md §1.3).
  */
object Schemas {

  /** Kafka wire-record schema — 13 declared fields, fixed (never inferred).
    * Reference: spark/batch_processor.py:31-45 (identical copy at
    * spark/stream_processor.py:31-45). `datetime` / `ingestion_timestamp`
    * arrive as ISO-8601 strings and are cast downstream (P2).
    */
  val wire: StructType = StructType(Seq(
    StructField("datetime", StringType),
    StructField("location_id", LongType),
    StructField("location_name", StringType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("parameter", StringType),
    StructField("value", DoubleType),
    StructField("value_standard", DoubleType),
    StructField("unit", StringType),
    StructField("aqi", DoubleType),
    StructField("aqi_category", StringType),
    StructField("ingestion_timestamp", StringType)
  ))

  /** Silver-layer columns, in output order (batch_processor.py:145-158). */
  val silverColumns: Seq[String] = Seq(
    "datetime", "location_id", "location_name", "country", "latitude",
    "longitude", "parameter", "value", "aqi", "aqi_category",
    "year", "month", "day")

  /** Gold group-by keys (batch_processor.py:193-203). The non-(location,hour)
    * keys ride along assuming functional dependency — preserved as-is
    * (SURVEY.md §2.10-6). */
  val goldKeys: Seq[String] = Seq(
    "datetime", "location_id", "location_name", "country", "latitude",
    "longitude", "year", "month", "day")
}

/** Typed view of a Silver row, for Dataset[T] ergonomics where useful. */
final case class Measurement(
    datetime: java.sql.Timestamp,
    location_id: Long,
    location_name: String,
    country: String,
    latitude: Double,
    longitude: Double,
    parameter: String,
    value: Double,
    aqi: Option[Double],
    aqi_category: Option[String],
    year: Int,
    month: Int,
    day: Int)
