package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.features.Features

/** W1-W4 / R5-R7 pandas-parity semantics (SURVEY.md §2.5, §7.4-2) on a
  * hand-computed golden series. */
class FeaturesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one station, hourly grid with a gap (row windows must IGNORE the gap)
  private val series: Seq[(Timestamp, Long, Double)] = {
    val hours = Seq(0, 1, 2, 3, 4, 7, 8) // gap at 5-6
    hours.zipWithIndex.map { case (h, i) =>
      (Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), 1L, (i + 1) * 10.0)
    }
  }

  private def goldDf = series.toDF("datetime", "location_id", "aqi")
    .withColumn("country", lit("VN"))

  test("W1: lag is row-based, not time-based (gap shifts the horizon)") {
    val lagged = Features.lagFeatures(goldDf)
      .orderBy("datetime").collect()
    // row at hour 7 (index 5): lag1 = value at hour 4 (50.0), not hour 6
    val hour7 = lagged(5)
    assert(hour7.getAs[Double]("aqi_lag_1h") === 50.0)
    assert(hour7.isNullAt(hour7.fieldIndex("aqi_lag_24h")))
  }

  test("W2: target is lead(1) and each station's last row is dropped") {
    val t = Features.withTarget(goldDf)
    assert(t.count() === series.size - 1)
    val first = t.orderBy("datetime").head()
    assert(first.getAs[Double]("aqi_next") === 20.0)
  }

  test("W3: rolling stats use min_periods=1 and SAMPLE std (ddof=1, " +
    "null on 1-row window)") {
    val r = Features.rollingFeatures(goldDf).orderBy("datetime").collect()
    val row0 = r(0)
    assert(row0.getAs[Double]("aqi_mean_7d") === 10.0)
    assert(row0.isNullAt(row0.fieldIndex("aqi_std_7d"))) // pandas: NaN
    val row2 = r(2) // values 10,20,30
    assert(row2.getAs[Double]("aqi_mean_7d") === 20.0)
    assert(math.abs(row2.getAs[Double]("aqi_std_7d") - 10.0) < 1e-12)
    assert(row2.getAs[Double]("aqi_max_7d") === 30.0)
    assert(row2.getAs[Double]("aqi_min_7d") === 10.0)
  }

  test("R5: day_of_week is Mon=0 (pandas), is_weekend = dow>=5") {
    // 2024-01-01 is a Monday; 2024-01-06 a Saturday
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (Timestamp.valueOf("2024-01-06 00:00:00"), 1L)
    ).toDF("datetime", "location_id")
    val t = Features.timeFeatures(df).orderBy("datetime").collect()
    assert(t(0).getAs[Int]("day_of_week") === 0)
    assert(!t(0).getAs[Boolean]("is_weekend"))
    assert(t(1).getAs[Int]("day_of_week") === 5)
    assert(t(1).getAs[Boolean]("is_weekend"))
  }

  test("R6: pollutant columns from parallel arrays, missing → 0.0") {
    val df = Seq(
      (1L, Seq("pm25", "o3"), Seq(12.5, 0.05)),
      (2L, Seq.empty[String], Seq.empty[Double])
    ).toDF("location_id", "parameters", "values")
    val p = Features.pollutantColumns(df).orderBy("location_id").collect()
    assert(p(0).getAs[Double]("pm25") === 12.5)
    assert(p(0).getAs[Double]("o3") === 0.05)
    assert(p(0).getAs[Double]("no2") === 0.0)
    assert(p(1).getAs[Double]("pm25") === 0.0)
  }

  test("R7: country encoding is alphabetical 0..n-1 (LabelEncoder parity)") {
    val df = Seq("VN", "TH", "KH", "TH", "VN").toDF("country")
    val enc = Features.countryEncoding(df).orderBy("country").collect()
    assert(enc.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("KH", 0), ("TH", 1), ("VN", 2)))
  }
}
