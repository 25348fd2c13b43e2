package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online-experiment analytics: deterministic variant assignment, the
  * two-proportion z-test (x68), and CUPED variance reduction (x69) —
  * the pair every experimentation platform computes over an events
  * log.
  *
  * Determinism contract (the w14/x51 discipline): every statistic
  * reduces to EXACT integer/decimal sums in one partial-aggregatable
  * pass over the per-user grain; the final z / theta / adjusted means
  * are then a handful of IEEE double ops over those exact operands.
  * The scalar formulas are rendered ONCE as SQL fragments shared
  * verbatim by the Spark plan (`expr`) and the DuckDB oracle, so both
  * engines evaluate the identical expression tree — identical
  * correctly-rounded doubles — before the 6dp round. Double literals
  * are spelled `CAST('1' AS DOUBLE)` (a bare 1.0 is DECIMAL in
  * DuckDB).
  *
  * Variant assignment is the t6/t27 RNG-free convention: the 48-bit
  * md5 prefix of the unit id, mod the arm count — reproducible across
  * engines, runs, and partitionings, and independent of the metric
  * (assignment never peeks at outcomes).
  *
  * Scale: the corpus contributes exactly ONE user-grain aggregate per
  * operator (conversion flags / pre-post sums fold map-side); the
  * experiment report is a single row computed from a 1-row stats
  * frame. Nothing user-sized is sorted, windowed, or collected.
  */
object Experiment {

  /** 48-bit md5 prefix of the id column, mod `arms` — Spark side. */
  def variant(unitCol: String, arms: Int = 2): Column =
    expr(s"CAST(conv(substring(md5(CAST(" +
      s"$unitCol AS STRING)), 1, 12), 16, 10) AS BIGINT) % $arms")

  /** Same hash in DuckDB syntax. */
  def variantSql(unitId: String, arms: Int = 2): String =
    s"CAST(('0x' || substr(md5(CAST($unitId AS VARCHAR)), 1, 12)) " +
      s"AS BIGINT) % $arms"

  private def d(c: String) = s"CAST($c AS DOUBLE)"

  // -------------------------------------------------- two-proportion z

  /** Shared scalar tail of the A/B report: conversion rates, absolute
    * difference, pooled two-proportion z — identical SQL text in both
    * engines over the exact counts (n_a, n_b, x_a, x_b). Degenerate
    * designs (an empty arm, all-or-none conversion → zero pooled
    * standard error) yield NULL z, not a division by zero. */
  private val pooled =
    s"(${d("x_a")} + ${d("x_b")}) / (${d("n_a")} + ${d("n_b")})"
  private val zExpr =
    s"""CASE WHEN n_a > 0 AND n_b > 0
       |  AND x_a + x_b > 0 AND x_a + x_b < n_a + n_b
       |THEN round((${d("x_a")} / ${d("n_a")} - ${d("x_b")} / ${d("n_b")})
       |  / sqrt($pooled * (CAST('1' AS DOUBLE) - $pooled)
       |    * (CAST('1' AS DOUBLE) / ${d("n_a")}
       |      + CAST('1' AS DOUBLE) / ${d("n_b")})), 6)
       |ELSE NULL END""".stripMargin.replace('\n', ' ')
  private def rate(x: String, n: String) =
    s"CASE WHEN $n > 0 THEN round(${d(x)} / ${d(n)}, 6) ELSE NULL END"

  /** Two-arm A/B conversion report: one row — per-arm unit and
    * converter counts, conversion rates, rate difference (A − B), and
    * the pooled two-proportion z statistic. A unit converts if it has
    * ≥1 event of `convType`. */
  def abTest(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type",
      convType: String = "purchase"): DataFrame = {
    val per = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("v", variant(userCol))
    per.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("x_a"),
      sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("x_b"))
      .select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        expr(rate("x_a", "n_a")).as("cr_a"),
        expr(rate("x_b", "n_b")).as("cr_b"),
        expr(s"""round(${d("x_a")} / ${d("n_a")}
                 | - ${d("x_b")} / ${d("n_b")}, 6)"""
          .stripMargin.replace('\n', ' ')).as("cr_diff"),
        expr(zExpr).as("z"))
  }

  /** DuckDB twin of [[abTest]] over an events relation. */
  def abTestSql(eventsRel: String = "events", userCol: String = "user_id",
      typeCol: String = "event_type",
      convType: String = "purchase"): String =
    s"""WITH per AS (SELECT $userCol,
       |    max(CASE WHEN $typeCol = '$convType' THEN 1 ELSE 0 END)
       |      AS conv,
       |    ${variantSql(userCol)} AS v
       |  FROM $eventsRel GROUP BY $userCol),
       |s AS (SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS x_a,
       |    CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS x_b
       |  FROM per)
       |SELECT n_a, n_b, x_a, x_b,
       |  ${rate("x_a", "n_a")} AS cr_a,
       |  ${rate("x_b", "n_b")} AS cr_b,
       |  round(${d("x_a")} / ${d("n_a")}
       |    - ${d("x_b")} / ${d("n_b")}, 6) AS cr_diff,
       |  $zExpr AS z
       |FROM s""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------- CUPED

  /** Shared scalar tail of the CUPED report over the exact sufficient
    * statistics (n, sx, sy, sxy, sxx, syy and the per-arm splits).
    * theta = cov(X,Y)/var(X) with NULL (not NaN) when the pre-period
    * metric has zero variance; var_reduction = squared correlation. */
  private val covXY = s"(${d("n")} * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
  private val varX  = s"(${d("n")} * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
  private val varY  = s"(${d("n")} * ${d("syy")} - ${d("sy")} * ${d("sy")})"
  private val theta =
    s"CASE WHEN $varX > 0 THEN $covXY / $varX ELSE NULL END"
  private def adj(arm: String) =
    s"""round(${d(s"sy_$arm")} / ${d(s"n_$arm")}
       |  - ($theta)
       |    * (${d(s"sx_$arm")} / ${d(s"n_$arm")} - ${d("sx")} / ${d("n")}),
       |  6)""".stripMargin.replace('\n', ' ')
  private val varRed =
    s"""CASE WHEN $varX > 0 AND $varY > 0
       |THEN round($covXY * $covXY / ($varX * $varY), 6)
       |ELSE NULL END""".stripMargin.replace('\n', ' ')

  /** CUPED-adjusted experiment readout: per-unit pre-period (`us` <
    * cutoff) and post-period value sums X and Y as exact decimals,
    * theta = cov(X,Y)/var(X) pooled over ALL units (the standard
    * assignment-independent estimator), and per-arm raw vs adjusted
    * post-period means plus the achieved variance-reduction ratio
    * (squared X–Y correlation). One row.
    *
    * The per-unit sums are DECIMAL(18,2)→(18,4) before the cross
    * products so X·Y / X² / Y² stay inside exact decimal widths in
    * BOTH engines (Spark (37,8), DuckDB (36,8) — no silent
    * double fallback). */
  def cuped(events: DataFrame, cutoffMicros: Long,
      usCol: String = "us", userCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    val per = events.groupBy(col(userCol))
      .agg(
        coalesce(sum(when(col(usCol) < cutoffMicros,
          col(valueCol).cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
          .cast("decimal(18,4)").as("x"),
        coalesce(sum(when(col(usCol) >= cutoffMicros,
          col(valueCol).cast("decimal(18,2)"))), lit(0).cast("decimal(18,2)"))
          .cast("decimal(18,4)").as("y"))
      .withColumn("v", variant(userCol))
    per.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("v") === 0, col("x")).otherwise(lit(0)
        .cast("decimal(18,4)"))).as("sx_a"),
      sum(when(col("v") === 1, col("x")).otherwise(lit(0)
        .cast("decimal(18,4)"))).as("sx_b"),
      sum(when(col("v") === 0, col("y")).otherwise(lit(0)
        .cast("decimal(18,4)"))).as("sy_a"),
      sum(when(col("v") === 1, col("y")).otherwise(lit(0)
        .cast("decimal(18,4)"))).as("sy_b"))
      .select(col("n_a"), col("n_b"),
        expr(rate("sy_a", "n_a")).as("mean_y_a"),
        expr(rate("sy_b", "n_b")).as("mean_y_b"),
        expr(s"round(($theta), 6)").as("theta"),
        expr(adj("a")).as("mean_y_a_cuped"),
        expr(adj("b")).as("mean_y_b_cuped"),
        expr(varRed).as("var_reduction"))
  }

  /** DuckDB twin of [[cuped]]; `usExpr` renders the µs column from
    * the raw relation (e.g. `epoch_us(ts)`). */
  def cupedSql(cutoffMicros: Long, eventsRel: String = "events",
      usExpr: String = "epoch_us(ts)", userCol: String = "user_id",
      valueCol: String = "value"): String =
    s"""WITH per AS (SELECT $userCol,
       |    CAST(coalesce(sum(CASE WHEN $usExpr < $cutoffMicros
       |        THEN CAST($valueCol AS DECIMAL(18,2)) END),
       |      CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS x,
       |    CAST(coalesce(sum(CASE WHEN $usExpr >= $cutoffMicros
       |        THEN CAST($valueCol AS DECIMAL(18,2)) END),
       |      CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS y,
       |    ${variantSql(userCol)} AS v
       |  FROM $eventsRel GROUP BY $userCol),
       |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    sum(CASE WHEN v = 0 THEN x ELSE CAST(0 AS DECIMAL(18,4)) END)
       |      AS sx_a,
       |    sum(CASE WHEN v = 1 THEN x ELSE CAST(0 AS DECIMAL(18,4)) END)
       |      AS sx_b,
       |    sum(CASE WHEN v = 0 THEN y ELSE CAST(0 AS DECIMAL(18,4)) END)
       |      AS sy_a,
       |    sum(CASE WHEN v = 1 THEN y ELSE CAST(0 AS DECIMAL(18,4)) END)
       |      AS sy_b
       |  FROM per)
       |SELECT n_a, n_b,
       |  ${rate("sy_a", "n_a")} AS mean_y_a,
       |  ${rate("sy_b", "n_b")} AS mean_y_b,
       |  round(($theta), 6) AS theta,
       |  ${adj("a")} AS mean_y_a_cuped,
       |  ${adj("b")} AS mean_y_b_cuped,
       |  $varRed AS var_reduction
       |FROM s""".stripMargin.replace('\n', ' ')
}
