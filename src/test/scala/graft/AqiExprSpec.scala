package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Aqi

/** [[graft.expr.AqiBreakpoint]] (the compact codegen'd R1 kernel) must be
  * semantically IDENTICAL to the original when-chain form it replaced on
  * the medallion hot path — including the reference quirks: inter-band
  * gaps → null, above-top-band clamp to 500, negative/NaN/unknown → null,
  * HALF_UP rounding. The sweep runs through a real Spark projection, so
  * the generated-code path (not just interpreted eval) is what's pinned. */
class AqiExprSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def grid: Seq[(String, java.lang.Double)] = {
    val params = Aqi.breakpoints.map(_._1) :+ "unknown"
    val perParam = params.flatMap { p =>
      val top = Aqi.breakpoints.toMap.get(p).map(_.last.cHi).getOrElse(10.0)
      // dense sweep: 400 steps over [-top*0.05, top*1.2] hits every band,
      // every gap, both clamp regions and plenty of rounding boundaries
      (0 to 400).map(i => p -> java.lang.Double.valueOf(
        -top * 0.05 + i * (top * 1.25) / 400)) ++
        // exact band edges (the closed-interval boundaries)
        Aqi.breakpoints.toMap.get(p).toSeq.flatten.flatMap(b =>
          Seq(b.cLo, b.cHi).map(p -> java.lang.Double.valueOf(_)))
    }
    perParam ++ Seq(
      "pm25" -> java.lang.Double.valueOf(Double.NaN),
      "pm25" -> null,
      null.asInstanceOf[String] -> java.lang.Double.valueOf(10.0),
      null.asInstanceOf[String] -> null)
  }

  test("kernel expression ≡ when-chain on a dense grid (codegen path)") {
    import spark.implicits._
    val df = grid.toDF("parameter", "value")
    val cmp = df
      .withColumn("a_kernel", Aqi.aqi(col("parameter"), col("value")))
      .withColumn("a_chain", Aqi.aqiWhenChain(col("parameter"), col("value")))
      .withColumn("same", col("a_kernel") <=> col("a_chain"))
    val bad = cmp.filter(!col("same")).collect()
    assert(bad.isEmpty, s"kernel/when-chain mismatch: ${bad.take(5).toSeq}")
    // the sweep actually exercises real values (not all-null)
    assert(cmp.filter(col("a_kernel").isNotNull).count() > 1000)
  }

  test("kernel expression ≡ plain-Scala reference on scalar cases") {
    import spark.implicits._
    val cases = Seq("pm25" -> 7.3, "pm10" -> 155.0, "o3" -> 0.3,
      "co" -> 9.45, "so2" -> 0.0355, "no2" -> 0.1, "pm25" -> 12.05,
      "pm25" -> 600.0, "unknown" -> 5.0)
    val rows = cases.toDF("parameter", "value")
      .withColumn("a", Aqi.aqi(col("parameter"), col("value")))
      .select("parameter", "value", "a").collect()
    rows.foreach { r =>
      val expect = Aqi.aqiScala(r.getString(0), r.getDouble(1))
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == expect, s"${r.getString(0)}/${r.getDouble(1)}")
    }
  }
}
