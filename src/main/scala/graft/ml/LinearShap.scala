package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Shapley attributions for a linear model (ml15): for OLS the
  * Shapley value of feature j on row i has the closed form
  * φ_ij = β_j·(x_ij − x̄_j) with base value ȳ, and
  * prediction = base + Σ_j φ_ij — the model-explanation operator
  * (which feature drove THIS row's prediction) without any sampling
  * approximation.
  *
  * The model is two-feature + intercept OLS fit from nine exact
  * sufficient statistics in ONE partial-aggregatable pass (the
  * ml2/NormalEquations shape, closed-form 2×2 solve instead of a
  * driver solve so the DuckDB twin can replay it).
  *
  * Determinism — ALL-INTEGER outputs, zero doubles, zero rounding
  * convention: with y quantized to exact cents, every Cramer
  * numerator and the determinant are exact integers (held in
  * DECIMAL(38,0) on Spark / HUGEINT on DuckDB — the third-level
  * products exceed int64). Outputs are BIGINT micro-units
  * (dollars × 10⁶ for base/φ/pred, dollars-per-unit × 10⁶ for the
  * βs), each produced by ONE sign-safe truncating integer division
  * whose div operands are always non-negative — so truncating and
  * flooring integral-divide conventions provably agree across
  * engines (the x88 discipline; this replaced the round(double, 6)
  * outputs that failed the driver's DuckDB at a half-ulp boundary).
  * φ divides β_micro·(n·x − Σx) by n (compounding ≤ 1 µ of β
  * truncation — deterministically, identically in both engines), and
  * pred_micro := base_micro + φ₁_micro + φ₂_micro so Shapley
  * additivity holds EXACTLY by construction.
  *
  * Scale: one corpus-grain aggregate for the stats; the 1-row stats
  * frame broadcasts onto however many rows need explaining — scoring
  * is scan-speed arithmetic. */
object LinearShap {

  /** Engine profile: how to spell a 128-bit-capable exact integer
    * cast and the integral-divide operator. */
  private case class Engine(big: String => String, divOp: String)
  private val sparkE = Engine(c => s"CAST($c AS DECIMAL(38,0))", "div")
  private val duckE = Engine(c => s"CAST($c AS HUGEINT)", "//")

  /** Sign-safe truncation toward zero with non-negative div operands
    * (b > 0 always: det > 0 under the guard, n > 0). */
  private def sdiv(a: String, b: String, e: Engine): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) ${e.divOp} ($b) " +
      s"ELSE -((-($a)) ${e.divOp} ($b)) END)"

  // exact second-level statistics (integer, but beyond int64 at the
  // third level — promote to the engine's 128-bit form first)
  private def frags(e: Engine): Map[String, String] = {
    import e.big
    val a11 = s"(${big("n")} * ${big("s11")} - ${big("s1")} * ${big("s1")})"
    val a22 = s"(${big("n")} * ${big("s22")} - ${big("s2")} * ${big("s2")})"
    val a12 = s"(${big("n")} * ${big("s12")} - ${big("s1")} * ${big("s2")})"
    val b1c = s"(${big("n")} * ${big("s1yc")} - ${big("s1")} * ${big("syc")})"
    val b2c = s"(${big("n")} * ${big("s2yc")} - ${big("s2")} * ${big("syc")})"
    val det = s"($a11 * $a22 - $a12 * $a12)"
    // Cramer numerators, cent-scaled: beta_cents = nBeta / det
    val n1 = s"($a22 * $b1c - $a12 * $b2c)"
    val n2 = s"($a11 * $b2c - $a12 * $b1c)"
    Map("a11" -> a11, "a22" -> a22, "a12" -> a12, "det" -> det,
      "n1" -> n1, "n2" -> n2)
  }

  /** The six output expressions, shared verbatim between engines up
    * to the big-int cast + div spelling. */
  private def outs(e: Engine): Seq[(String, String)] = {
    val f = frags(e)
    import e.big
    val guard = s"${f("det")} <> 0"
    def g(x: String) = s"CASE WHEN $guard THEN CAST($x AS BIGINT) END"
    // cents → micro-dollars is ×10⁴
    val base = sdiv(s"${big("syc")} * 10000", big("n"), e)
    val beta1 = sdiv(s"${f("n1")} * 10000", f("det"), e)
    val beta2 = sdiv(s"${f("n2")} * 10000", f("det"), e)
    def phi(beta: String, x: String, sx: String) = sdiv(
      s"($beta) * (${big("n")} * ${big(x)} - ${big(sx)})", big("n"), e)
    val phi1 = phi(beta1, "x1", "s1")
    val phi2 = phi(beta2, "x2", "s2")
    Seq(
      "base_micro" -> g(base),
      "beta1_micro" -> g(beta1),
      "beta2_micro" -> g(beta2),
      "phi_x1_micro" -> g(phi1),
      "phi_x2_micro" -> g(phi2),
      "pred_micro" -> g(s"($base) + ($phi1) + ($phi2)"))
  }

  /** @param data  one row per unit: `idCol`, numeric `x1`/`x2`
    *              (exact integral), decimal `yCol`
    * @param explainFilter which rows to emit attributions for
    * @return (id, x1, x2, y, base_micro, beta1_micro, beta2_micro,
    *         phi_x1_micro, phi_x2_micro, pred_micro) — BIGINT
    *         micro-unit attributions, NULL on a singular design */
  def attribute(data: DataFrame, idCol: String, x1Col: String,
      x2Col: String, yCol: String,
      explainFilter: Column): DataFrame = {
    val prep = data.select(col(idCol).as("id"),
      col(x1Col).cast("long").as("x1"),
      col(x2Col).cast("long").as("x2"),
      col(yCol).cast("decimal(18,2)").as("y"))
      .withColumn("yc", expr("CAST(y * 100 AS BIGINT)"))
    val stats = prep.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("yc")).as("syc"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("yc")).as("s1yc"),
      sum(col("x2") * col("yc")).as("s2yc"))
    val cols = Seq(col("id"), col("x1"), col("x2"), col("y")) ++
      outs(sparkE).map { case (name, e) => expr(e).as(name) }
    prep.filter(explainFilter)
      .crossJoin(broadcast(stats))
      .select(cols: _*)
      .orderBy("id")
  }

  /** DuckDB twin; `dataRel` must yield (id, x1, x2, y) with x1/x2
    * integral and y DECIMAL(18,2). */
  def sql(dataRel: String, explainPred: String): String = {
    val o = outs(duckE)
      .map { case (name, e) => s"$e AS $name" }.mkString(", ")
    s"""WITH prep AS (SELECT id, CAST(x1 AS BIGINT) AS x1,
       |    CAST(x2 AS BIGINT) AS x2, y,
       |    CAST(y * 100 AS BIGINT) AS yc FROM $dataRel),
       |st AS (SELECT count(*) AS n,
       |    sum(x1) AS s1, sum(x2) AS s2, sum(yc) AS syc,
       |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
       |    sum(x1 * x2) AS s12, sum(x1 * yc) AS s1yc,
       |    sum(x2 * yc) AS s2yc
       |  FROM prep)
       |SELECT id, x1, x2, y, $o
       |FROM prep CROSS JOIN st
       |WHERE $explainPred
       |ORDER BY id""".stripMargin.replace('\n', ' ')
  }
}
