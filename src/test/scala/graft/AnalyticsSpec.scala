package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Queries
import graft.etl.Silver
import graft.model.Measurement

/** Direct fixture tests for the OLAP surface (oracle-checked end-to-end;
  * these pin the per-operator semantics on hand-built data). */
class AnalyticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def silverDf = Seq(
    // (datetime, location, name, country, lat, lon, param, value, aqi, cat, y, m, d)
    (ts("2024-01-01 10:00:00"), 1L, "a", "VN", 1.0, 2.0, "pm25", 10.0,
      Some(42.0), Some("Good"), 2024, 1, 1),
    (ts("2024-01-08 10:00:00"), 1L, "a", "VN", 1.0, 2.0, "pm10", 60.0,
      Some(53.0), Some("Moderate"), 2024, 1, 8),
    (ts("2024-01-02 09:00:00"), 2L, "b", "TH", 3.0, 4.0, "pm25", 200.0,
      Some(250.0), Some("Very Unhealthy"), 2024, 1, 2),
    // stale station: last report 7+ days before the global max
    (ts("2023-12-25 00:00:00"), 3L, "c", "KH", 5.0, 6.0, "o3", 0.05,
      Some(46.0), Some("Good"), 2023, 12, 25)
  ).toDF("datetime", "location_id", "location_name", "country", "latitude",
    "longitude", "parameter", "value", "aqi", "aqi_category", "year",
    "month", "day")

  test("A9: alive = last report within 7 days of the global max") {
    val alive = Queries.aliveStations(silverDf)
      .select("location_id").as[Long].collect().sorted
    assert(alive === Array(1L, 2L))
  }

  test("A11: station AQI is the max across its parameters, " +
    "category from that max") {
    val r = Queries.stationMaxAqi(silverDf).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getString(2)))
    assert(r.contains((1L, 53.0, "Moderate")))
    assert(r.contains((2L, 250.0, "Very Unhealthy")))
  }

  test("A10: overall country AQI = max over parameters, shared across " +
    "the country's rows") {
    val r = Queries.countryLive(silverDf)
      .filter(col("country") === "VN").collect()
    assert(r.length === 2) // pm25, pm10
    assert(r.forall(_.getAs[Double]("country_aqi") === 53.0))
    assert(r.forall(_.getAs[String]("country_category") === "Moderate"))
  }

  test("W5: top-N is the latest N by datetime") {
    val top = Queries.latestTopN(silverDf, 2)
      .select("location_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L)) // 01-08 10:00 then 01-02 09:00
  }

  test("typed Dataset view exposes Measurement fields with Options for " +
    "nullable aqi") {
    val ds = Silver.typed(silverDf)
    val m: Measurement = ds.filter(_.location_id == 2L).head()
    assert(m.aqi.contains(250.0) && m.country == "TH")
    val perCountry = ds.groupByKey(_.country).count().collect().toMap
    assert(perCountry("VN") === 2L)
  }
}
