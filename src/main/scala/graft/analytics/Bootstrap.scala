package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence interval for the A/B conversion-rate
  * difference (x73) — the at-scale bootstrap: classical resampling
  * needs n draws per replicate from a global index, but Poisson(1)
  * per-row weights are i.i.d. and index-free, so every replicate is
  * ONE weighted aggregate over the same scan (the standard
  * large-scale formulation). Complements x68's parametric z with a
  * distribution-free interval.
  *
  * "Random" is the repo's RNG-free contract: the (unit, replicate)
  * weight is Poisson(1)-inverse-CDF applied to the 48-bit md5 of
  * `user|b` — the CDF thresholds are PRECOMPUTED integer literals
  * (⌊cum·2⁴⁸⌋) emitted identically into both engines, so no
  * transcendental is ever evaluated at query time and both engines
  * draw bit-identical weights. Replicate diffs are single divisions
  * of exact integer sums, rounded to 6 dp; the interval is the 2nd
  * smallest / 2nd largest of the B = 32 replicate diffs (the ~94%
  * percentile-bootstrap interval at this B), picked by rank — order
  * statistics of identical values, no float comparisons across
  * engines.
  *
  * Scale: corpus → user grain (one aggregate) → ×B replicate rows →
  * (replicate, arm) grain. The B× blow-up is the bootstrap's
  * inherent cost and it rides map-side partial aggregation; nothing
  * user-sized is sorted or collected. */
object Bootstrap {

  /** ⌊P(Poisson(1) ≤ k)·2⁴⁸⌋ for k = 0..8; heavier tails get w=9. */
  private val thresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val cums = (0 to 8).scanLeft(0.0) { (acc, k) =>
      acc + e1 / (1 to k).map(_.toDouble).product
    }.tail // cumulative P(X <= k)
    cums.map(c => (c * math.pow(2, 48)).toLong)
  }

  private def weightCase(h: String): String =
    thresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 9 END")

  private def d(c: String) = s"CAST($c AS DOUBLE)"
  private val diffExpr =
    s"""CASE WHEN na > 0 AND nb > 0 THEN
       |round(${d("xa")} / ${d("na")} - ${d("xb")} / ${d("nb")}, 6)
       |END""".stripMargin.replace('\n', ' ')

  /** @return one row: (n_resamples, point_diff, ci_lo, ci_hi) */
  def conversionDiffCi(events: DataFrame, b: Int = 32,
      userCol: String = "user_id", typeCol: String = "event_type",
      convType: String = "purchase"): DataFrame = {
    val per = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("v", Experiment.variant(userCol))
    val point = per.agg(
      sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("xa"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("xb"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("nb"))
      .select(expr(diffExpr).as("point_diff"))
    val weighted = per
      .select(col(userCol), col("conv"), col("v"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("h", expr(
        s"CAST(conv(substring(md5(concat(CAST($userCol AS STRING), " +
          s"'|', CAST(b AS STRING))), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("w", expr(weightCase("h")).cast("long"))
    val diffs = weighted.groupBy(col("b")).agg(
      sum(when(col("v") === 0, col("w") * col("conv")).otherwise(0L))
        .as("xa"),
      sum(when(col("v") === 0, col("w")).otherwise(0L)).as("na"),
      sum(when(col("v") === 1, col("w") * col("conv")).otherwise(0L))
        .as("xb"),
      sum(when(col("v") === 1, col("w")).otherwise(0L)).as("nb"))
      .select(col("b"), expr(diffExpr).as("diff"))
    val ranked = diffs
      .withColumn("rk", row_number().over(
        Window.orderBy(col("diff"), col("b"))))
    ranked.agg(
      count(lit(1)).as("n_resamples"),
      max(when(col("rk") === 2, col("diff"))).as("ci_lo"),
      max(when(col("rk") === b - 1, col("diff"))).as("ci_hi"))
      .crossJoin(point)
      .select(col("n_resamples"), col("point_diff"), col("ci_lo"),
        col("ci_hi"))
  }

  /** DuckDB twin. */
  def conversionDiffCiSql(b: Int = 32, eventsRel: String = "events",
      userCol: String = "user_id", typeCol: String = "event_type",
      convType: String = "purchase"): String = {
    val h =
      s"CAST(('0x' || substr(md5(CAST($userCol AS VARCHAR) || '|' || " +
        s"CAST(b AS VARCHAR)), 1, 12)) AS BIGINT)"
    s"""WITH per AS (SELECT $userCol,
       |    max(CASE WHEN $typeCol = '$convType' THEN 1 ELSE 0 END)
       |      AS conv,
       |    ${Experiment.variantSql(userCol)} AS v
       |  FROM $eventsRel GROUP BY $userCol),
       |pt AS (SELECT $diffExpr AS point_diff FROM (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS xa,
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS xb,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nb
       |  FROM per)),
       |wt AS (SELECT v, conv, b,
       |    CAST(${weightCase(h)} AS BIGINT) AS w
       |  FROM per, unnest(range(0, $b)) AS u(b)),
       |diffs AS (SELECT b, $diffExpr AS diff FROM (
       |  SELECT b,
       |    CAST(sum(CASE WHEN v = 0 THEN w * conv ELSE 0 END)
       |      AS BIGINT) AS xa,
       |    CAST(sum(CASE WHEN v = 0 THEN w ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN v = 1 THEN w * conv ELSE 0 END)
       |      AS BIGINT) AS xb,
       |    CAST(sum(CASE WHEN v = 1 THEN w ELSE 0 END) AS BIGINT)
       |      AS nb
       |  FROM wt GROUP BY b)),
       |rk AS (SELECT diff,
       |    row_number() OVER (ORDER BY diff, b) AS rk FROM diffs)
       |SELECT (SELECT count(*) FROM rk) AS n_resamples,
       |  (SELECT point_diff FROM pt) AS point_diff,
       |  (SELECT diff FROM rk WHERE rk = 2) AS ci_lo,
       |  (SELECT diff FROM rk WHERE rk = ${b - 1}) AS ci_hi"""
      .stripMargin.replace('\n', ' ')
  }
}
