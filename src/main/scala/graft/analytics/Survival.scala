package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (x67) — the right-censoring-aware
  * churn/retention curve: given one row per unit with its observation
  * duration and whether the terminal event was OBSERVED (vs censored —
  * the unit was still alive when observation ended), estimate
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over the distinct event times.
  * Naive retention-by-cohort-age overstates churn by counting
  * still-active users as lost; KM is the standard fix.
  *
  * Scale design: the corpus collapses FIRST to the (duration →
  * n_events, n_censored) histogram — one partial-aggregatable pass;
  * with day-granularity durations the histogram is bounded by the
  * observation span in days, not the unit count, so the unpartitioned
  * ordered windows below it (at-risk suffix counts, the cumulative
  * product) run on a metadata-sized table at any corpus size.
  *
  * Determinism (the t28 ln discipline): nᵢ and dᵢ are exact integers;
  * each factor's ln(1 − d/n) evaluates the identical IEEE tree in
  * both engines and rounds to 6 dp BEFORE summing in DECIMAL(38,6)
  * (associative, partial-sum-order-free); the final exp runs on the
  * same exact decimal cast to double. The d = n extinction row (the
  * whole risk set leaves by event) would be ln 0 → −∞, so it is
  * flagged as an integer and survival pins to exactly 0 from that
  * time on — in both engines, no infinities anywhere. */
object Survival {

  /** @param perUnit one row per unit: `durationCol` (integral),
    *                `observedCol` (1 = event observed, 0 = censored)
    * @return (t, n_at_risk, n_events, n_censored, survival) per
    *         distinct duration, ordered by t */
  def kaplanMeier(perUnit: DataFrame, durationCol: String = "t",
      observedCol: String = "observed"): DataFrame = {
    val h = perUnit.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol) === 1, 0L).otherwise(1L)).as("c"))
    val tot = h.agg(sum(col("d") + col("c")).as("n"))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.crossJoin(broadcast(tot))
      .withColumn("n_at_risk",
        col("n") - coalesce(sum(col("d") + col("c")).over(before),
          lit(0L)))
      .withColumn("term",
        when(col("d") > 0 && col("d") < col("n_at_risk"),
          round(log(lit(1.0) -
            col("d").cast("double") / col("n_at_risk").cast("double")),
            6)).otherwise(lit(0.0)).cast("decimal(38,6)"))
      .withColumn("dies",
        when(col("d") === col("n_at_risk"), 1).otherwise(0))
      .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        when(max(col("dies")).over(upTo) === 1, lit(0.0))
          .otherwise(round(exp(sum(col("term")).over(upTo)
            .cast("double")), 6)).as("survival"))
      .orderBy("t")
  }

  /** DuckDB twin of [[kaplanMeier]]; `perUnitRel` must yield
    * (t, observed). */
  def kaplanMeierSql(perUnitRel: String): String =
    s"""WITH pu AS (SELECT * FROM $perUnitRel),
       |h AS (SELECT t,
       |    CAST(sum(CASE WHEN observed = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN observed = 1 THEN 0 ELSE 1 END)
       |      AS BIGINT) AS c
       |  FROM pu GROUP BY t),
       |nn AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM h),
       |r AS (SELECT t, d, c,
       |    CAST(n - coalesce(sum(d + c) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n_at_risk
       |  FROM h CROSS JOIN nn),
       |s AS (SELECT t, d, c, n_at_risk,
       |    CAST(CASE WHEN d > 0 AND d < n_at_risk
       |      THEN round(ln(CAST('1' AS DOUBLE)
       |        - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)), 6)
       |      ELSE 0 END AS DECIMAL(38,6)) AS term,
       |    CASE WHEN d = n_at_risk THEN 1 ELSE 0 END AS dies
       |  FROM r)
       |SELECT t, n_at_risk, d AS n_events, c AS n_censored,
       |  CASE WHEN max(dies) OVER (ORDER BY t ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) = 1
       |    THEN CAST('0' AS DOUBLE)
       |    ELSE round(exp(CAST(sum(term) OVER (ORDER BY t ROWS
       |      BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS DOUBLE)), 6) END AS survival
       |FROM s ORDER BY t""".stripMargin.replace('\n', ' ')
}
