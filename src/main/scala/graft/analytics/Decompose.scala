package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal-trend decomposition (x70) over an
  * event stream: y = trend + seasonal + remainder on the hourly
  * value-sum series — the moving-average decomposition behind every
  * "is this spike seasonal or real" dashboard, and the principled
  * input to anomaly gates (x40/x42/x55 score the REMAINDER, not the
  * raw series, once seasonality exists).
  *
  * Semantics: the hourly series is GAP-FILLED dense (missing hours
  * contribute y = 0, n = 0 — a silent feed hour is data, not absence
  * of data); trend is the centered 25-hour rolling mean, NULL where
  * the window is incomplete (the classical edge convention, never a
  * partial-window estimate); the seasonal index is the mean
  * detrended value per hour-of-day; remainder = detrended − seasonal.
  *
  * Determinism: hourly sums are exact DECIMAL(18,2); the trend
  * divides the exact 25-row window sum once and rounds to 6 dp;
  * detrended subtracts two identical doubles; seasonal means sum
  * 6dp-rounded detrended values in DECIMAL(38,6) before ONE division
  * (the t28 discipline); remainder subtracts two rounded doubles.
  * Every division has exact operands and happens once — no compound
  * float chains.
  *
  * Scale: the corpus contributes ONE partial-aggregatable
  * (hour → n, Σvalue) pass; everything after runs on the dense hour
  * series, bounded by the TIME SPAN (hours), not the event count —
  * the unpartitioned ordered window is over that metadata-sized
  * series (the x67 argument). The 24-row seasonal table broadcasts
  * back. */
object Decompose {

  /** @return (h, n, y, trend, seasonal, remainder) per dense hour
    *         index h = µs div 3600000000, ordered by h */
  def hourlyAdditive(events: DataFrame, usCol: String = "us",
      valueCol: String = "value"): DataFrame = {
    val hourly = events
      .groupBy(expr(s"$usCol div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("ys"))
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val dense = bounds.select(
      explode(sequence(col("h0"), col("h1"))).as("h"))
    val series = dense.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("ys"), lit(0).cast("decimal(18,2)")).as("y"))
    val w25 = Window.orderBy(col("h")).rowsBetween(-12, 12)
    val withTrend = series
      .withColumn("wcnt", count(lit(1)).over(w25))
      .withColumn("wsum", sum(col("y")).over(w25))
      .withColumn("trend", when(col("wcnt") === 25,
        round(col("wsum").cast("double") / 25.0, 6)))
      .withColumn("detr", when(col("trend").isNotNull,
        round(col("y").cast("double") - col("trend"), 6)))
    val seasonal = withTrend.filter(col("detr").isNotNull)
      .groupBy((col("h") % 24).as("hod"))
      .agg(round(
        sum(col("detr").cast("decimal(38,6)")).cast("double") /
          count(col("detr")).cast("double"), 6).as("seasonal"))
    withTrend
      .join(broadcast(seasonal), col("h") % 24 === col("hod"), "left")
      .select(col("h"), col("n"), col("y"), col("trend"),
        col("seasonal"),
        when(col("detr").isNotNull,
          round(col("detr") - col("seasonal"), 6)).as("remainder"))
      .orderBy("h")
  }

  /** DuckDB twin of [[hourlyAdditive]]; `eventsRel` must yield
    * (us, value). */
  def hourlyAdditiveSql(
      eventsRel: String =
        "(SELECT epoch_us(ts) AS us, value FROM events)"): String =
    s"""WITH ev AS (SELECT us, value FROM $eventsRel),
       |hourly AS (SELECT us // 3600000000 AS h, count(*) AS n,
       |    sum(CAST(value AS DECIMAL(18,2))) AS ys
       |  FROM ev GROUP BY 1),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
       |dense AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
       |series AS (SELECT d.h,
       |    CAST(coalesce(t.n, 0) AS BIGINT) AS n,
       |    coalesce(t.ys, CAST(0 AS DECIMAL(18,2))) AS y
       |  FROM dense d LEFT JOIN hourly t ON d.h = t.h),
       |tr AS (SELECT h, n, y,
       |    CASE WHEN count(*) OVER w = 25
       |      THEN round(CAST(sum(y) OVER w AS DOUBLE)
       |        / CAST('25' AS DOUBLE), 6) END AS trend
       |  FROM series
       |  WINDOW w AS (ORDER BY h
       |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
       |dt AS (SELECT *, CASE WHEN trend IS NOT NULL
       |    THEN round(CAST(y AS DOUBLE) - trend, 6) END AS detr
       |  FROM tr),
       |sea AS (SELECT h % 24 AS hod,
       |    round(CAST(sum(CAST(detr AS DECIMAL(38,6))) AS DOUBLE)
       |      / CAST(count(detr) AS DOUBLE), 6) AS seasonal
       |  FROM dt WHERE detr IS NOT NULL GROUP BY 1)
       |SELECT d.h, d.n, d.y, d.trend, s.seasonal,
       |  CASE WHEN d.detr IS NOT NULL
       |    THEN round(d.detr - s.seasonal, 6) END AS remainder
       |FROM dt d LEFT JOIN sea s ON d.h % 24 = s.hod
       |ORDER BY d.h""".stripMargin.replace('\n', ' ')
}
