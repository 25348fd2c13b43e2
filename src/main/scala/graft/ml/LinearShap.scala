package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Shapley attributions for a linear model (ml15): for OLS the
  * Shapley value of feature j on row i has the closed form
  * φ_ij = β_j·(x_ij − x̄_j) with base value ȳ, and
  * prediction = base + Σ_j φ_ij exactly — the model-explanation
  * operator (which feature drove THIS row's prediction) without any
  * sampling approximation.
  *
  * The model is two-feature + intercept OLS fit from nine exact
  * sufficient statistics in ONE partial-aggregatable pass (the
  * ml2/NormalEquations shape, closed-form 2×2 solve instead of a
  * driver solve so the DuckDB twin can replay it); the betas, base,
  * and per-row attributions are shared SQL fragments evaluated
  * verbatim by both engines over those exact sums — identical IEEE
  * trees, 6 dp rounds, NULLs (never NaN) on a singular design.
  *
  * Scale: one corpus-grain aggregate for the stats; the 1-row stats
  * frame broadcasts onto however many rows need explaining — scoring
  * is scan-speed arithmetic. */
object LinearShap {

  private def d(c: String) = s"CAST($c AS DOUBLE)"
  private[ml] val a11 = s"(${d("n")} * ${d("s11")} - ${d("s1")} * ${d("s1")})"
  private[ml] val a22 = s"(${d("n")} * ${d("s22")} - ${d("s2")} * ${d("s2")})"
  private[ml] val a12 = s"(${d("n")} * ${d("s12")} - ${d("s1")} * ${d("s2")})"
  private[ml] val b1n = s"(${d("n")} * ${d("s1y")} - ${d("s1")} * ${d("sy")})"
  private[ml] val b2n = s"(${d("n")} * ${d("s2y")} - ${d("s2")} * ${d("sy")})"
  private[ml] val det = s"($a11 * $a22 - $a12 * $a12)"
  private[ml] val beta1 = s"(($a22 * $b1n - $a12 * $b2n) / $det)"
  private[ml] val beta2 = s"(($a11 * $b2n - $a12 * $b1n) / $det)"
  private[ml] val beta0 =
    s"((${d("sy")} - $beta1 * ${d("s1")} - $beta2 * ${d("s2")}) / ${d("n")})"
  private[ml] val guard = s"$det <> 0"
  private def g(e: String) = s"CASE WHEN $guard THEN round($e, 6) END"
  private val phi1 = s"($beta1 * (${d("x1")} - ${d("s1")} / ${d("n")}))"
  private val phi2 = s"($beta2 * (${d("x2")} - ${d("s2")} / ${d("n")}))"

  /** @param data  one row per unit: `idCol`, numeric `x1`/`x2`
    *              (exact integral or decimal), decimal `yCol`
    * @param explainFilter which rows to emit attributions for
    * @return (id, x1, x2, y, base, beta1, beta2, phi_x1, phi_x2,
    *         pred) */
  def attribute(data: DataFrame, idCol: String, x1Col: String,
      x2Col: String, yCol: String,
      explainFilter: Column): DataFrame = {
    val prep = data.select(col(idCol).as("id"),
      col(x1Col).cast("decimal(18,0)").as("x1"),
      col(x2Col).cast("decimal(18,0)").as("x2"),
      col(yCol).cast("decimal(18,2)").as("y"))
    val stats = prep.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    prep.filter(explainFilter)
      .crossJoin(broadcast(stats))
      .select(col("id"), col("x1"), col("x2"), col("y"),
        expr(g(s"${d("sy")} / ${d("n")}")).as("base"),
        expr(g(beta1)).as("beta1"),
        expr(g(beta2)).as("beta2"),
        expr(g(phi1)).as("phi_x1"),
        expr(g(phi2)).as("phi_x2"),
        expr(g(s"$beta0 + $beta1 * ${d("x1")} + $beta2 * ${d("x2")}"))
          .as("pred"))
      .orderBy("id")
  }

  /** DuckDB twin; `dataRel` must yield (id, x1, x2, y) with x1/x2
    * DECIMAL(18,0) and y DECIMAL(18,2). */
  def sql(dataRel: String, explainPred: String): String =
    s"""WITH prep AS (SELECT id, x1, x2, y FROM $dataRel),
       |st AS (SELECT count(*) AS n,
       |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
       |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
       |    sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
       |    sum(x2 * y) AS s2y
       |  FROM prep)
       |SELECT id, x1, x2, y,
       |  ${g(s"${d("sy")} / ${d("n")}")} AS base,
       |  ${g(beta1)} AS beta1,
       |  ${g(beta2)} AS beta2,
       |  ${g(phi1)} AS phi_x1,
       |  ${g(phi2)} AS phi_x2,
       |  ${g(s"$beta0 + $beta1 * ${d("x1")} + $beta2 * ${d("x2")}")}
       |    AS pred
       |FROM prep CROSS JOIN st
       |WHERE $explainPred
       |ORDER BY id""".stripMargin.replace('\n', ' ')
}
