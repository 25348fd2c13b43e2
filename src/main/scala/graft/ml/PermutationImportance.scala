package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Permutation feature importance (ml19) — the model-agnostic "which
  * feature actually matters" eval (Breiman 2001): break one feature's
  * relation to the target by permuting its column, re-evaluate the
  * FIXED model, and read the SSE inflation. Complements ml15's exact
  * Shapley (per-row attribution) with a global importance ranking.
  *
  * The permutation is RNG-free: rows rank by the md5 of their id (the
  * t6 content-hash order) and each row takes the permuted value from
  * the NEXT rank, wrapping — a deterministic cyclic derangement both
  * engines reproduce exactly. One donor row supplies both features'
  * permuted values, so base + both permuted SSEs come from ONE
  * aggregate over the single rank join.
  *
  * Model + determinism: the two-feature OLS is [[LinearShap]]'s
  * closed-form fit from nine exact decimal sufficient statistics (the
  * fragments are shared verbatim); residual-square terms round once
  * to 6 dp and sum in DECIMAL(38,6), so partial-sum order is
  * irrelevant. The hash-rank window is an entity-grain global sort —
  * the accepted x78-class cost (entities, not events).
  *
  * Guard rails baked into the ratio: a singular design NULLs the
  * betas (LinearShap's guard) and propagates NULL importances; an
  * exactly-zero base SSE (perfect fit) yields NULL rather than a
  * division blow-up. */
object PermutationImportance {

  private def d(c: String) = s"CAST($c AS DOUBLE)"
  private val pred =
    s"(${LinearShap.beta0} + ${LinearShap.beta1} * ${d("x1")}" +
      s" + ${LinearShap.beta2} * ${d("x2")})"
  private val predP1 =
    s"(${LinearShap.beta0} + ${LinearShap.beta1} * ${d("x1p")}" +
      s" + ${LinearShap.beta2} * ${d("x2")})"
  private val predP2 =
    s"(${LinearShap.beta0} + ${LinearShap.beta1} * ${d("x1")}" +
      s" + ${LinearShap.beta2} * ${d("x2p")})"
  // the singularity guard lives INSIDE the sum (per-term CASE): a
  // singular design NULLs every term and the whole SSE — the only
  // form both engines accept (an outer CASE would reference
  // non-grouped stats columns from inside an aggregate query)
  private def sse(p: String) =
    s"sum(CAST(CASE WHEN ${LinearShap.guard} THEN " +
      s"round((${d("y")} - $p) * (${d("y")} - $p), 6) END" +
      s" AS DECIMAL(38,6)))"

  /** @param data one row per unit: `idCol`, numeric `x1`/`x2` (exact
    *             integral), decimal-safe `yCol`
    * @return (feature, sse_base, sse_permuted, importance) — 2 rows */
  def importance(data: DataFrame, idCol: String, x1Col: String,
      x2Col: String, yCol: String): DataFrame = {
    val prep = data.select(col(idCol).as("id"),
      col(x1Col).cast("decimal(18,0)").as("x1"),
      col(x2Col).cast("decimal(18,0)").as("x2"),
      col(yCol).cast("decimal(18,2)").as("y"))
      .localCheckpoint() // referenced by stats, both rank-join sides
    val stats = prep.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    val ranked = prep.withColumn("r", row_number().over(Window.orderBy(
      md5(col("id").cast("string").cast("binary")), col("id")))
      .cast("long"))
    val joined = ranked
      .crossJoin(broadcast(stats))
      .join(ranked.select(col("r").as("rd"), col("x1").as("x1p"),
        col("x2").as("x2p")),
        col("rd") === col("r") % col("n") + 1)
    val agg = joined.agg(
      expr(sse(pred)).as("sse_base"),
      expr(sse(predP1)).as("sse_x1"),
      expr(sse(predP2)).as("sse_x2"))
    agg.select(explode(array(
        struct(lit("x1").as("feature"), col("sse_base"),
          col("sse_x1").as("sse_permuted")),
        struct(lit("x2").as("feature"), col("sse_base"),
          col("sse_x2").as("sse_permuted")))).as("f"))
      .select(col("f.feature"),
        col("f.sse_base").cast("double").as("sse_base"),
        col("f.sse_permuted").cast("double").as("sse_permuted"),
        when(col("f.sse_base") > 0, round(
          (col("f.sse_permuted").cast("double") -
            col("f.sse_base").cast("double")) /
            col("f.sse_base").cast("double"), 6)).as("importance"))
      .orderBy("feature")
  }

  /** DuckDB twin; `dataRel` must yield (id, x1, x2, y) with x1/x2
    * DECIMAL(18,0) and y DECIMAL(18,2). */
  def sql(dataRel: String): String =
    s"""WITH prep AS (SELECT id, x1, x2, y FROM $dataRel),
       |st AS (SELECT count(*) AS n,
       |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
       |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
       |    sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
       |    sum(x2 * y) AS s2y
       |  FROM prep),
       |rk AS (SELECT *, CAST(row_number() OVER (
       |    ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) AS r
       |  FROM prep),
       |j AS (SELECT a.x1, a.x2, a.y, b.x1 AS x1p, b.x2 AS x2p, st.*
       |  FROM rk a CROSS JOIN st
       |  JOIN rk b ON b.r = a.r % st.n + 1),
       |ag AS (SELECT
       |    ${sse(pred)} AS sse_base,
       |    ${sse(predP1)} AS sse_x1,
       |    ${sse(predP2)} AS sse_x2
       |  FROM j),
       |un AS (
       |  SELECT 'x1' AS feature, sse_base, sse_x1 AS sse_permuted
       |  FROM ag
       |  UNION ALL
       |  SELECT 'x2' AS feature, sse_base, sse_x2 AS sse_permuted
       |  FROM ag)
       |SELECT feature,
       |  CAST(sse_base AS DOUBLE) AS sse_base,
       |  CAST(sse_permuted AS DOUBLE) AS sse_permuted,
       |  CASE WHEN sse_base > 0 THEN round(
       |    (CAST(sse_permuted AS DOUBLE) - CAST(sse_base AS DOUBLE))
       |    / CAST(sse_base AS DOUBLE), 6) END AS importance
       |FROM un ORDER BY feature""".stripMargin.replace('\n', ' ')
}
