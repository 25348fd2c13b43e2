package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** US-EPA AQI math: R1 (breakpoint interpolation), R2 (unit normalization),
  * R3 (category bucketing). Semantics from the reference's
  * `aqi_calculator.py:8-128`.
  *
  * Design: every function exists in three synchronized forms generated from
  * ONE breakpoint table —
  *   1. a Catalyst `Column` when-chain (codegen'd, no UDF — stays inside
  *      WholeStageCodegen, critical at 100 TB where a boxed UDF call per row
  *      dominates),
  *   2. an ANSI-SQL string twin for the DuckDB oracle (bit-identical double
  *      arithmetic: slopes are precomputed in Scala and emitted as literals,
  *      so both engines evaluate the same constants in the same order),
  *   3. a plain Scala function for unit-test fixtures.
  *
  * Quirks preserved (SURVEY.md §2.10):
  *   - inter-band gaps (e.g. pm25 in (12.0, 12.1)) yield null (reference
  *     falls through the band loop, aqi_calculator.py:78-88);
  *   - concentration above the top band clamps to 500 (o3 has no 301-500
  *     band, so o3 > 0.200 → 500);
  *   - negative / NaN / null concentration → null;
  *   - unknown pollutant → null.
  * Deviation (conscious): Python `round()` is banker's rounding; we use
  * HALF_UP so Spark and the SQL oracle agree. Exact .5 ties require
  * constructed inputs (measure zero on real data).
  */
object Aqi {

  final case class Band(cLo: Double, cHi: Double, iLo: Int, iHi: Int) {
    /** Precomputed in Scala so both engines see the identical double. */
    val slope: Double = (iHi - iLo).toDouble / (cHi - cLo)
  }

  /** aqi_calculator.py:8-56, verbatim values. */
  val breakpoints: Seq[(String, Vector[Band])] = Seq(
    "pm25" -> Vector(
      Band(0.0, 12.0, 0, 50), Band(12.1, 35.4, 51, 100),
      Band(35.5, 55.4, 101, 150), Band(55.5, 150.4, 151, 200),
      Band(150.5, 250.4, 201, 300), Band(250.5, 500.4, 301, 500)),
    "pm10" -> Vector(
      Band(0, 54, 0, 50), Band(55, 154, 51, 100),
      Band(155, 254, 101, 150), Band(255, 354, 151, 200),
      Band(355, 424, 201, 300), Band(425, 604, 301, 500)),
    "o3" -> Vector(
      Band(0.000, 0.054, 0, 50), Band(0.055, 0.070, 51, 100),
      Band(0.071, 0.085, 101, 150), Band(0.086, 0.105, 151, 200),
      Band(0.106, 0.200, 201, 300)),
    "co" -> Vector(
      Band(0.0, 4.4, 0, 50), Band(4.5, 9.4, 51, 100),
      Band(9.5, 12.4, 101, 150), Band(12.5, 15.4, 151, 200),
      Band(15.5, 30.4, 201, 300), Band(30.5, 50.4, 301, 500)),
    "so2" -> Vector(
      Band(0.000, 0.035, 0, 50), Band(0.036, 0.075, 51, 100),
      Band(0.076, 0.185, 101, 150), Band(0.186, 0.304, 151, 200),
      Band(0.305, 0.604, 201, 300), Band(0.605, 1.004, 301, 500)),
    "no2" -> Vector(
      Band(0.000, 0.053, 0, 50), Band(0.054, 0.100, 51, 100),
      Band(0.101, 0.360, 101, 150), Band(0.361, 0.649, 151, 200),
      Band(0.650, 1.249, 201, 300), Band(1.250, 2.049, 301, 500))
  )

  /** µg/m³ → ppm factors for gases (aqi_calculator.py:102-107). */
  val conversionFactors: Seq[(String, Double)] = Seq(
    "o3" -> 24.45 / 48.0 / 1000,
    "co" -> 24.45 / 28.0 / 1000,
    "so2" -> 24.45 / 64.0 / 1000,
    "no2" -> 24.45 / 46.0 / 1000)

  /** Shortest-round-trip double literal, emitted as CAST('…' AS DOUBLE):
    * DuckDB treats unquoted numeric literals as DECIMAL (higher-precision
    * arithmetic path → different rounding than IEEE doubles); the string
    * cast goes through strtod and is bit-identical to the JVM's double. */
  private[graft] def d(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  // ---------------------------------------------------------------- R1: aqi

  /** Per-row AQI. Evaluates via the compact [[AqiBreakpoint]] native
    * expression (one static kernel call in generated code) — the
    * ~200-node when-chain form ([[aqiWhenChain]]) blew janino's 64 KB
    * method limit when fused with R2/R3 + the wire mapping in one
    * projection, knocking the medallion parse stage out of whole-stage
    * codegen. Semantics are identical (AqiExprSpec pins the
    * equivalence on a dense grid incl. gaps/clamps/ties). */
  def aqi(parameter: Column, value: Column): Column =
    AqiExprs.aqiBreakpoint(parameter, value.cast("double"))

  /** The original when-chain form of R1 — kept as the executable spec
    * [[AqiBreakpoint]] is tested against. */
  def aqiWhenChain(parameter: Column, value: Column): Column = {
    val invalid = parameter.isNull || value.isNull || isnan(value) || value < 0
    breakpoints
      .foldLeft(when(invalid, lit(null).cast("double"))) {
        case (acc, (p, bands)) => acc.when(parameter === p, bandsExpr(bands, value))
      }
      .otherwise(lit(null).cast("double"))
  }

  private def bandsExpr(bands: Vector[Band], v: Column): Column = {
    val first = when(v >= bands.head.cLo && v <= bands.head.cHi, interp(bands.head, v))
    bands.tail
      .foldLeft(first)((acc, b) => acc.when(v >= b.cLo && v <= b.cHi, interp(b, v)))
      .when(v > bands.last.cHi, lit(500.0))
      .otherwise(lit(null).cast("double"))
  }

  private def interp(b: Band, v: Column): Column =
    round(lit(b.slope) * (v - lit(b.cLo)) + lit(b.iLo.toDouble))

  /** DuckDB-dialect twin of [[aqi]] (identical structure + constants). */
  def aqiSql(p: String, v: String): String = {
    val perParam = breakpoints.map { case (name, bands) =>
      s"WHEN $p = '$name' THEN ${bandsSql(bands, v)}"
    }.mkString(" ")
    s"(CASE WHEN $p IS NULL OR $v IS NULL OR isnan($v) OR $v < 0 THEN NULL " +
      s"$perParam ELSE NULL END)"
  }

  private def bandsSql(bands: Vector[Band], v: String): String = {
    val whens = bands.map { b =>
      s"WHEN $v >= ${d(b.cLo)} AND $v <= ${d(b.cHi)} THEN " +
        s"round(${d(b.slope)} * ($v - ${d(b.cLo)}) + ${d(b.iLo.toDouble)})"
    }.mkString(" ")
    s"(CASE $whens WHEN $v > ${d(bands.last.cHi)} THEN ${d(500.0)} ELSE NULL END)"
  }

  /** Plain-Scala reference implementation for unit tests. */
  def aqiScala(parameter: String, c: Double): Option[Double] = {
    if (c.isNaN || c < 0) return None
    breakpoints.toMap.get(parameter).flatMap { bands =>
      bands.find(b => b.cLo <= c && c <= b.cHi) match {
        case Some(b) =>
          Some(BigDecimal(b.slope * (c - b.cLo) + b.iLo)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
        case None => if (c > bands.last.cHi) Some(500.0) else None
      }
    }
  }

  // ----------------------------------------------------------- R3: category

  private val categoryBounds: Seq[(Int, String)] = Seq(
    50 -> "Good", 100 -> "Moderate", 150 -> "Unhealthy for Sensitive Groups",
    200 -> "Unhealthy", 300 -> "Very Unhealthy")

  /** aqi_calculator.py:115-128; null-safe (null aqi → null category). */
  def category(aqi: Column): Column =
    categoryBounds
      .foldLeft(when(aqi.isNull, lit(null).cast("string"))) {
        case (acc, (bound, name)) => acc.when(aqi <= bound, lit(name))
      }
      .otherwise(lit("Hazardous"))

  def categorySql(a: String): String = {
    val whens = categoryBounds
      .map { case (bound, name) => s"WHEN $a <= $bound THEN '$name'" }
      .mkString(" ")
    s"(CASE WHEN $a IS NULL THEN NULL $whens ELSE 'Hazardous' END)"
  }

  def categoryScala(aqi: Double): String =
    categoryBounds.collectFirst { case (b, n) if aqi <= b => n }
      .getOrElse("Hazardous")

  // -------------------------------------------------- R4: recommendation

  /** app.py:65-104 — the serving-layer 6-way bucket mapping AQI to a UI
    * payload (message, icon, color). Emitted as a struct column. */
  val recommendations: Seq[(Int, (String, String, String))] = Seq(
    50 -> (("Air quality is good. Enjoy outdoor activities!", "😊", "#00E400")),
    100 -> (("Air quality is acceptable for most people.", "🙂", "#FFFF00")),
    150 -> (("Sensitive groups should reduce outdoor exertion.", "😐", "#FF7E00")),
    200 -> (("Everyone should limit prolonged outdoor exertion.", "😷", "#FF0000")),
    300 -> (("Avoid outdoor activities. Wear a mask outside.", "🤢", "#8F3F97")))

  private val hazardRec =
    ("Stay indoors. Health emergency conditions.", "☠️", "#7E0023")

  def recommendation(aqi: Column): Column = {
    def asStruct(r: (String, String, String)) = struct(
      lit(r._1).as("message"), lit(r._2).as("icon"), lit(r._3).as("color"))
    recommendations
      .foldLeft(when(aqi.isNull, lit(null).cast(
        "struct<message:string,icon:string,color:string>"))) {
        case (acc, (bound, r)) => acc.when(aqi <= bound, asStruct(r))
      }
      .otherwise(asStruct(hazardRec))
  }

  /** Flat SQL twin (three parallel CASEs — struct-free for the oracle). */
  def recommendationSql(a: String, field: Int): String = {
    val pick: ((String, String, String)) => String =
      r => Seq(r._1, r._2, r._3)(field)
    val whens = recommendations
      .map { case (b, r) => s"WHEN $a <= $b THEN '${pick(r)}'" }
      .mkString(" ")
    s"(CASE WHEN $a IS NULL THEN NULL $whens ELSE '${pick(hazardRec)}' END)"
  }

  // ------------------------------------------------------ R2: unit-to-standard

  /** aqi_calculator.py:91-112: ppm passthrough; µg/m³ → ppm for gases;
    * everything else (incl. unknown units / PM in µg/m³) passthrough. */
  def toStandard(parameter: Column, unit: Column, value: Column): Column =
    conversionFactors
      .foldLeft(when(unit === "ppm", value)) { case (acc, (p, f)) =>
        acc.when(parameter === p && unit === "µg/m³", value * lit(f))
      }
      .otherwise(value)

  def toStandardSql(p: String, u: String, v: String): String = {
    val whens = conversionFactors.map { case (pp, f) =>
      s"WHEN $p = '$pp' AND $u = 'µg/m³' THEN $v * ${d(f)}"
    }.mkString(" ")
    s"(CASE WHEN $u = 'ppm' THEN $v $whens ELSE $v END)"
  }

  def toStandardScala(parameter: String, unit: String, value: Double): Double =
    if (unit == "ppm") value
    else conversionFactors.toMap.get(parameter) match {
      case Some(f) if unit == "µg/m³" => value * f
      case _ => value
    }
}
