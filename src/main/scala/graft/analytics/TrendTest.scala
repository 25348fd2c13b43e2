package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test (x71) — the nonparametric "is this series
  * actually trending" significance test that pairs with x70's
  * decomposition (x70 shows the components; x71 says whether the
  * monotone drift is distinguishable from noise, with no normality
  * or linearity assumption):
  *
  *   S       = Σ_{i<j} sign(y_j − y_i)
  *   Var(S)  = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
  *   z       = (S∓1)/√Var(S)   (continuity-corrected, 0 when S = 0)
  *
  * Scale: the corpus collapses to the gap-filled hourly sum series
  * first (one partial-aggregatable pass — the x67/x70 argument), so
  * the O(span²) pair enumeration runs on a TIME-SPAN-bounded series
  * (720 hours → 260k pairs), never on events; tie groups come from a
  * |distinct values|-bounded aggregate.
  *
  * Determinism: S, n, and the tie correction are exact integers
  * (value comparisons are exact decimal comparisons); Var(S) and z
  * are shared SQL fragments over those integers — one division, one
  * sqrt, 6 dp — identical trees in both engines. */
object TrendTest {

  private def d(c: String) = s"CAST($c AS DOUBLE)"
  private val varS =
    s"""((${d("n")} * (${d("n")} - 1) * (2 * ${d("n")} + 5)
       | - ${d("tsum")}) / 18)""".stripMargin.replace('\n', ' ')
  private val zExpr =
    s"""CASE WHEN s > 0 THEN round((${d("s")} - 1) / sqrt($varS), 6)
       |WHEN s < 0 THEN round((${d("s")} + 1) / sqrt($varS), 6)
       |ELSE CAST('0' AS DOUBLE) END""".stripMargin.replace('\n', ' ')

  /** Mann–Kendall over the dense hourly value-sum series of an event
    * stream. @return one row (n, s, var_s, z). */
  def mannKendallHourly(events: DataFrame, usCol: String = "us",
      valueCol: String = "value"): DataFrame = {
    val hourly = events
      .groupBy(expr(s"$usCol div 3600000000").as("h"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("ys"))
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val series = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("ys"), lit(0).cast("decimal(18,2)")).as("y"))
      .localCheckpoint() // span-bounded; the pair join below squares it
    val a = series.select(col("h").as("hi"), col("y").as("yi"))
    val b = series.select(col("h").as("hj"), col("y").as("yj"))
    val sStat = a.join(b, col("hi") < col("hj"))
      .agg(sum(signum(col("yj") - col("yi")).cast("long")).as("s"))
    val n = series.agg(count(lit(1)).as("n"))
    val ties = series.groupBy(col("y")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tsum"))
    sStat.crossJoin(n).crossJoin(ties)
      .select(col("n"), col("s"),
        expr(s"round($varS, 6)").as("var_s"),
        expr(zExpr).as("z"))
  }

  /** DuckDB twin; `eventsRel` must yield (us, value). */
  def mannKendallHourlySql(
      eventsRel: String =
        "(SELECT epoch_us(ts) AS us, value FROM events)"): String =
    s"""WITH hourly AS (SELECT us // 3600000000 AS h,
       |    sum(CAST(value AS DECIMAL(18,2))) AS ys
       |  FROM $eventsRel GROUP BY 1),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
       |series AS MATERIALIZED (SELECT d.h,
       |    coalesce(t.ys, CAST(0 AS DECIMAL(18,2))) AS y
       |  FROM (SELECT unnest(range(h0, h1 + 1)) AS h FROM b) d
       |  LEFT JOIN hourly t ON d.h = t.h),
       |ss AS (SELECT CAST(sum(CASE WHEN x.yj > x.yi THEN 1
       |      WHEN x.yj < x.yi THEN -1 ELSE 0 END) AS BIGINT) AS s
       |  FROM (SELECT a.y AS yi, c.y AS yj FROM series a
       |    JOIN series c ON a.h < c.h) x),
       |nn AS (SELECT count(*) AS n FROM series),
       |tt AS (SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5))
       |      AS BIGINT), 0) AS tsum
       |  FROM (SELECT count(*) AS t FROM series GROUP BY y))
       |SELECT n, s, round($varS, 6) AS var_s, $zExpr AS z
       |FROM ss CROSS JOIN nn CROSS JOIN tt"""
      .stripMargin.replace('\n', ' ')

  /** Theil–Sen slope estimator (x77) — the robust trend MAGNITUDE
    * companion to Mann–Kendall over the SAME hourly series (x71 says
    * whether the drift is real; this says how steep, immune to the
    * outlier hours that wreck an OLS slope — 29% breakdown point):
    * the median of all pairwise slopes (y_j − y_i)/(h_j − h_i).
    *
    * Same scale shape as x71: the corpus collapses to the span-bounded
    * series first, the O(span²) pair join never touches events. Each
    * slope is ONE double division of an exact decimal difference by an
    * exact integer gap — identical operands in both engines — and the
    * median is an integer RANK-PICK (row (m+1) div 2 of the sorted
    * multiset; even m takes the lower middle — documented, no
    * averaging of two floats). The sort ranks ≤ span² slopes, not
    * corpus rows. @return one row (n_pairs, slope_per_hour). */
  def theilSenHourly(events: DataFrame, usCol: String = "us",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(expr(s"$usCol div 3600000000").as("h"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("ys"))
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val series = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("ys"), lit(0).cast("decimal(18,2)")).as("y"))
      .localCheckpoint() // span-bounded; the pair join below squares it
    val slopes = series.select(col("h").as("hi"), col("y").as("yi"))
      .join(series.select(col("h").as("hj"), col("y").as("yj")),
        col("hi") < col("hj"))
      .select(((col("yj") - col("yi")).cast("double") /
        (col("hj") - col("hi")).cast("double")).as("slope"))
    val m = slopes.agg(count(lit(1)).as("n_pairs"))
    slopes
      .withColumn("rn", row_number().over(Window.orderBy(col("slope"))))
      .crossJoin(broadcast(m))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), round(col("slope"), 6).as("slope_per_hour"))
  }

  /** DuckDB twin of [[theilSenHourly]]. */
  def theilSenHourlySql(
      eventsRel: String =
        "(SELECT epoch_us(ts) AS us, value FROM events)"): String =
    s"""WITH hourly AS (SELECT us // 3600000000 AS h,
       |    sum(CAST(value AS DECIMAL(18,2))) AS ys
       |  FROM $eventsRel GROUP BY 1),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
       |series AS MATERIALIZED (SELECT d.h,
       |    coalesce(t.ys, CAST(0 AS DECIMAL(18,2))) AS y
       |  FROM (SELECT unnest(range(h0, h1 + 1)) AS h FROM b) d
       |  LEFT JOIN hourly t ON d.h = t.h),
       |sl AS (SELECT CAST(c.y - a.y AS DOUBLE) / (c.h - a.h) AS slope
       |  FROM series a JOIN series c ON a.h < c.h),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM sl),
       |r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn
       |  FROM sl)
       |SELECT n_pairs, round(slope, 6) AS slope_per_hour
       |FROM r CROSS JOIN m WHERE rn = (n_pairs + 1) // 2"""
      .stripMargin.replace('\n', ' ')
}
