package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact leave-one-out influence for simple OLS (ml24) — the
  * data-valuation primitive ("which training rows actually move the
  * model") behind influence-based curation: for y = a + b·x fit by
  * least squares, refit WITHOUT unit i and report how the model's
  * prediction at x_i moves. For OLS this needs no retraining pass per
  * unit — the five sufficient statistics minus unit i's own
  * contribution give the held-out fit in closed form, so the whole
  * operator is ONE partial-aggregatable stats pass plus scan-speed
  * per-row arithmetic under a 1-row broadcast (the ml15 shape; the
  * same algebra is what Sherman–Morrison/hat-matrix LOO formulas
  * compute).
  *
  * Determinism (the round-8 ml15 discipline): x integral, y quantized
  * to exact cents; full and held-out Cramer numerators/determinants
  * are exact integers held in DECIMAL(38,0) (Spark) / HUGEINT
  * (DuckDB); every output is BIGINT micro-units produced by ONE
  * sign-safe truncating division with non-negative div operands — no
  * doubles, no rounding convention anywhere.
  *
  * Output semantics: beta_micro is the full-fit slope (dollars per
  * unit ×10⁶, identical on every row — the model context);
  * beta_loo_micro the slope without the row; pred_micro /
  * pred_loo_micro the full and held-out predictions at the row's own
  * x; influence_micro = pred_micro − pred_loo_micro (positive = the
  * row pulls its own prediction up — self-supporting points and
  * outliers rank first). NULL when either design is singular or the
  * held-out sample has < 2 rows. */
object LooInfluence {

  private case class Engine(big: String => String, divOp: String)
  private val sparkE = Engine(c => s"CAST($c AS DECIMAL(38,0))", "div")
  private val duckE = Engine(c => s"CAST($c AS HUGEINT)", "//")

  private def sdiv(a: String, b: String, e: Engine): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) ${e.divOp} ($b) " +
      s"ELSE -((-($a)) ${e.divOp} ($b)) END)"

  /** The seven output expressions over columns
    * (id, x, yc, n, sx, syc, sxx, sxyc). */
  private def outs(e: Engine): Seq[(String, String)] = {
    import e.big
    def fit(n: String, sx: String, sy: String, sxx: String,
        sxy: String): (String, String) = {
      val det = s"(${big(n)} * ${big(sxx)} - ${big(sx)} * ${big(sx)})"
      val nb = s"(${big(n)} * ${big(sxy)} - ${big(sx)} * ${big(sy)})"
      (det, nb)
    }
    val (det, nb) = fit("n", "sx", "syc", "sxx", "sxyc")
    // held-out stats: the row's own contribution subtracted
    val (detL, nbL) = fit("(n - 1)", "(sx - x)", "(syc - yc)",
      "(sxx - x * x)", "(sxyc - x * yc)")
    // pred(x) = a + b·x = (Sy·det + Nb·(n·x − Sx)) / (n·det), cents →
    // micro is ×10⁴; all integer
    def pred(n: String, sx: String, sy: String, det: String,
        nb: String) = sdiv(
      s"(${big(sy)} * $det + $nb * (${big(n)} * ${big("x")} - ${big(sx)}))" +
        s" * 10000",
      s"(${big(n)} * $det)", e)
    val predFull = pred("n", "sx", "syc", det, nb)
    val predLoo = pred("(n - 1)", "(sx - x)", "(syc - yc)", detL, nbL)
    val guard = s"$det <> 0 AND $detL <> 0 AND n >= 3"
    def g(x: String) = s"CASE WHEN $guard THEN CAST($x AS BIGINT) END"
    Seq(
      "beta_micro" -> g(sdiv(s"$nb * 10000", det, e)),
      "beta_loo_micro" -> g(sdiv(s"$nbL * 10000", detL, e)),
      "pred_micro" -> g(predFull),
      "pred_loo_micro" -> g(predLoo),
      "influence_micro" -> g(s"($predFull) - ($predLoo)"))
  }

  /** @param data one row per unit: idCol, integral `xCol`, decimal
    *             `yCol`
    * @param explainFilter which rows to emit influence for
    * @return (id, x, y, beta_micro, beta_loo_micro, pred_micro,
    *         pred_loo_micro, influence_micro) */
  def influence(data: DataFrame, idCol: String, xCol: String,
      yCol: String, explainFilter: Column): DataFrame = {
    val prep = data.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"),
      col(yCol).cast("decimal(18,2)").as("y"))
      .withColumn("yc", expr("CAST(y * 100 AS BIGINT)"))
    val stats = prep.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("yc")).as("syc"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yc")).as("sxyc"))
    val cols = Seq(col("id"), col("x"), col("y")) ++
      outs(sparkE).map { case (name, ex) => expr(ex).as(name) }
    prep.filter(explainFilter)
      .crossJoin(broadcast(stats))
      .select(cols: _*)
      .orderBy("id")
  }

  /** DuckDB twin; `dataRel` must yield (id, x, y DECIMAL(18,2)). */
  def sql(dataRel: String, explainPred: String): String = {
    val o = outs(duckE)
      .map { case (name, ex) => s"$ex AS $name" }.mkString(", ")
    s"""WITH prep AS (SELECT id, CAST(x AS BIGINT) AS x, y,
       |    CAST(y * 100 AS BIGINT) AS yc FROM $dataRel),
       |st AS (SELECT count(*) AS n, sum(x) AS sx, sum(yc) AS syc,
       |    sum(x * x) AS sxx, sum(x * yc) AS sxyc
       |  FROM prep)
       |SELECT id, x, y, $o
       |FROM prep CROSS JOIN st
       |WHERE $explainPred
       |ORDER BY id""".stripMargin.replace('\n', ' ')
  }
}
