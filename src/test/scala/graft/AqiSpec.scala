package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Aqi

/** R1-R3 semantics pinned to aqi_calculator.py:59-128 (SURVEY.md §2.7). */
class AqiSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("R1 breakpoint table matches reference values") {
    // spot values from aqi_calculator.py:8-56
    assert(Aqi.aqiScala("pm25", 0.0).contains(0.0))
    assert(Aqi.aqiScala("pm25", 12.0).contains(50.0))
    assert(Aqi.aqiScala("pm25", 35.4).contains(100.0))
    assert(Aqi.aqiScala("pm25", 500.4).contains(500.0))
    assert(Aqi.aqiScala("co", 4.4).contains(50.0))
    assert(Aqi.aqiScala("no2", 2.049).contains(500.0))
  }

  test("R1 inter-band gaps yield null (quirk: loop falls through)") {
    assert(Aqi.aqiScala("pm25", 12.05).isEmpty)
    assert(Aqi.aqiScala("pm10", 54.5).isEmpty)
    assert(Aqi.aqiScala("so2", 0.0355).isEmpty)
  }

  test("R1 above-top clamps to 500 (incl. o3 with no 301-500 band)") {
    assert(Aqi.aqiScala("pm25", 501.0).contains(500.0))
    assert(Aqi.aqiScala("o3", 0.201).contains(500.0))
    assert(Aqi.aqiScala("o3", 99.0).contains(500.0))
  }

  test("R1 invalid inputs yield null") {
    assert(Aqi.aqiScala("pm25", -0.01).isEmpty)
    assert(Aqi.aqiScala("pm25", Double.NaN).isEmpty)
    assert(Aqi.aqiScala("unknown", 10.0).isEmpty)
  }

  test("R2 conversion factors (aqi_calculator.py:102-107)") {
    assert(math.abs(Aqi.toStandardScala("o3", "µg/m³", 48000.0) - 24.45) < 1e-9)
    assert(Aqi.toStandardScala("co", "ppm", 7.0) === 7.0)
    assert(Aqi.toStandardScala("pm25", "µg/m³", 12.0) === 12.0)
    assert(Aqi.toStandardScala("so2", "weird-unit", 5.0) === 5.0)
  }

  test("R3 category boundaries (aqi_calculator.py:115-128)") {
    assert(Aqi.categoryScala(50) === "Good")
    assert(Aqi.categoryScala(50.5) === "Moderate")
    assert(Aqi.categoryScala(150) === "Unhealthy for Sensitive Groups")
    assert(Aqi.categoryScala(300) === "Very Unhealthy")
    assert(Aqi.categoryScala(301) === "Hazardous")
  }

  test("property: AQI is monotonic non-decreasing within a pollutant") {
    val gen = for {
      p <- Gen.oneOf(Aqi.breakpoints.map(_._1))
      a <- Gen.choose(0.0, 700.0)
      b <- Gen.choose(0.0, 700.0)
    } yield (p, math.min(a, b), math.max(a, b))
    check(Prop.forAll(gen) { case (p, lo, hi) =>
      (Aqi.aqiScala(p, lo), Aqi.aqiScala(p, hi)) match {
        case (Some(x), Some(y)) => x <= y
        case _ => true // gaps yield None; ordering not defined there
      }
    })
  }

  test("property: category is consistent with AQI bounds") {
    check(Prop.forAll(Gen.choose(0.0, 600.0)) { aqi =>
      val c = Aqi.categoryScala(aqi)
      if (aqi <= 50) c == "Good"
      else if (aqi > 300) c == "Hazardous"
      else c != "Good"
    })
  }

  test("Column form agrees with Scala form on a value grid") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val params = Aqi.breakpoints.map(_._1) :+ "unknown"
    val values = (BigDecimal(-2.0) to BigDecimal(700.0) by BigDecimal(0.37))
      .map(_.toDouble)
    val rows = for { p <- params; v <- values } yield (p, v)
    val df = rows.toDF("parameter", "value")
      .withColumn("aqi", Aqi.aqi(col("parameter"), col("value")))
    val got = df.collect().map(r =>
      (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    got.foreach { case (p, v, a) =>
      assert(a === Aqi.aqiScala(p, v), s"param=$p value=$v")
    }
  }
}
