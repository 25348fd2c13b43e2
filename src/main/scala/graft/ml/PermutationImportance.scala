package graft.ml

import org.apache.spark.sql.DataFrame
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
  * Model + determinism: the two-feature OLS is the [[LinearShap]]
  * closed-form fit from nine exact decimal sufficient statistics;
  * residual-square terms round once to 6 dp, convert EXACTLY to
  * integer micro-units, and sum as wide integers, so partial-sum
  * order is irrelevant and the output surface (SSEs and the
  * importance ratio) is pure integer arithmetic — no data-dependent
  * round(double) an engine's rounding mode could flip (round-8
  * audit). The hash-rank is the [[graft.etl.Ids.withOrderedIds]]
  * two-phase range-partitioned rank (no single-partition WindowExec):
  * the (md5, id) ordering pair collapses into one fixed-width sort
  * key — 32 hex chars + zero-padded id — so string order equals the
  * pair order, and ranks stay partition-parallel even when the
  * entity grain is itself huge.
  *
  * Guard rails baked into the ratio: a singular design NULLs the
  * betas (LinearShap's guard) and propagates NULL importances; an
  * exactly-zero base SSE (perfect fit) yields NULL rather than a
  * division blow-up. */
object PermutationImportance {

  private def d(c: String) = s"CAST($c AS DOUBLE)"
  // closed-form 2×2 OLS solve over the nine exact sums, evaluated as
  // identical IEEE double trees in both engines (the pre-round-8
  // LinearShap fragments, now local: ml15's OUTPUT surface moved to
  // exact integers, but ml19's per-term-rounded-then-DECIMAL-summed
  // SSE only needs engine-identical doubles INSIDE each term)
  private val a11 = s"(${d("n")} * ${d("s11")} - ${d("s1")} * ${d("s1")})"
  private val a22 = s"(${d("n")} * ${d("s22")} - ${d("s2")} * ${d("s2")})"
  private val a12 = s"(${d("n")} * ${d("s12")} - ${d("s1")} * ${d("s2")})"
  private val b1n = s"(${d("n")} * ${d("s1y")} - ${d("s1")} * ${d("sy")})"
  private val b2n = s"(${d("n")} * ${d("s2y")} - ${d("s2")} * ${d("sy")})"
  private val det = s"($a11 * $a22 - $a12 * $a12)"
  private val beta1 = s"(($a22 * $b1n - $a12 * $b2n) / $det)"
  private val beta2 = s"(($a11 * $b2n - $a12 * $b1n) / $det)"
  private val beta0 =
    s"((${d("sy")} - $beta1 * ${d("s1")} - $beta2 * ${d("s2")}) / ${d("n")})"
  private val guard = s"$det <> 0"
  private val pred =
    s"($beta0 + $beta1 * ${d("x1")} + $beta2 * ${d("x2")})"
  private val predP1 =
    s"($beta0 + $beta1 * ${d("x1p")} + $beta2 * ${d("x2")})"
  private val predP2 =
    s"($beta0 + $beta1 * ${d("x1")} + $beta2 * ${d("x2p")})"
  // the singularity guard lives INSIDE the sum (per-term CASE): a
  // singular design NULLs every term and the whole SSE — the only
  // form both engines accept (an outer CASE would reference
  // non-grouped stats columns from inside an aggregate query).
  // Each 6-dp-rounded term converts EXACTLY to integer micro-units
  // (the DECIMAL(24,6) hop is lossless; ×10⁶ reads its unscaled
  // value) so the sum — and everything derived from it — is pure
  // integer arithmetic: no data-dependent round(double) survives to
  // the output surface (round-8 rounding audit)
  private def sseMicro(p: String, big: String => String) =
    s"sum(${big(s"CAST(CASE WHEN $guard THEN " +
      s"round((${d("y")} - $p) * (${d("y")} - $p), 6) END" +
      s" AS DECIMAL(24,6)) * 1000000")})"

  private val sparkBig = (c: String) => s"CAST($c AS DECIMAL(38,0))"
  private val duckBig = (c: String) => s"CAST($c AS HUGEINT)"

  /** Sign-safe truncating division toward zero, non-negative div
    * operands (the x88/ml15 convention-free form). */
  private def sdiv(a: String, b: String, divOp: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $divOp ($b) " +
      s"ELSE -((-($a)) $divOp ($b)) END)"

  /** @param data one row per unit: `idCol`, numeric `x1`/`x2` (exact
    *             integral), decimal-safe `yCol`
    * @return (feature, sse_base_micro, sse_permuted_micro,
    *         importance_micro) — 2 rows; SSEs in BIGINT micro-units,
    *         importance = (permuted − base)/base ×10⁶ truncated
    *         toward zero */
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
    val keyed = prep.withColumn("__ok", concat(
      md5(col("id").cast("string").cast("binary")),
      graft.etl.Ids.fixedWidthKey(col("id"), 24)))
    val ranked = graft.etl.Ids.withOrderedIds(keyed, "__ok",
      idName = "r").drop("__ok")
    val joined = ranked
      .crossJoin(broadcast(stats))
      .join(ranked.select(col("r").as("rd"), col("x1").as("x1p"),
        col("x2").as("x2p")),
        col("rd") === col("r") % col("n") + 1)
    val agg = joined.agg(
      expr(sseMicro(pred, sparkBig)).as("sse_base"),
      expr(sseMicro(predP1, sparkBig)).as("sse_x1"),
      expr(sseMicro(predP2, sparkBig)).as("sse_x2"))
    agg.select(explode(array(
        struct(lit("x1").as("feature"), col("sse_base"),
          col("sse_x1").as("sse_permuted")),
        struct(lit("x2").as("feature"), col("sse_base"),
          col("sse_x2").as("sse_permuted")))).as("f"))
      .select(col("f.feature"),
        col("f.sse_base").cast("long").as("sse_base_micro"),
        col("f.sse_permuted").cast("long").as("sse_permuted_micro"),
        when(col("f.sse_base") > 0, expr(sdiv(
          "(CAST(f.sse_permuted AS DECIMAL(38,0)) - f.sse_base)" +
            " * 1000000",
          "f.sse_base", "div")).cast("long")).as("importance_micro"))
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
       |    ${sseMicro(pred, duckBig)} AS sse_base,
       |    ${sseMicro(predP1, duckBig)} AS sse_x1,
       |    ${sseMicro(predP2, duckBig)} AS sse_x2
       |  FROM j),
       |un AS (
       |  SELECT 'x1' AS feature, sse_base, sse_x1 AS sse_permuted
       |  FROM ag
       |  UNION ALL
       |  SELECT 'x2' AS feature, sse_base, sse_x2 AS sse_permuted
       |  FROM ag)
       |SELECT feature,
       |  CAST(sse_base AS BIGINT) AS sse_base_micro,
       |  CAST(sse_permuted AS BIGINT) AS sse_permuted_micro,
       |  CAST(CASE WHEN sse_base > 0 THEN ${sdiv(
             "(CAST(sse_permuted AS HUGEINT) - sse_base) * 1000000",
             "sse_base", "//")} END AS BIGINT) AS importance_micro
       |FROM un ORDER BY feature""".stripMargin.replace('\n', ' ')
}
