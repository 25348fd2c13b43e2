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
  * Determinism — ALL-INTEGER micro-units (value × 10⁶), zero doubles,
  * zero rounding convention anywhere: hourly sums are exact
  * DECIMAL(18,2) = exact cents; the 25-row trend mean is EXACT in
  * micro-units (cents·10⁶ / (25·100) = cents × 400, an integer
  * multiply); detrended is an integer subtraction; the per-hour-of-day
  * seasonal mean is ONE integer division truncated toward zero,
  * spelled as a CASE whose div operands are always NON-NEGATIVE so
  * truncating (Spark `div`) and flooring (some engines' `//`)
  * conventions provably agree; remainder is an integer subtraction.
  * Additivity y_micro = trend + seasonal + remainder is exact BY
  * CONSTRUCTION (remainder is defined as the difference).
  *
  * Scale: the corpus contributes ONE partial-aggregatable
  * (hour → n, Σvalue) pass; everything after runs on the dense hour
  * series, bounded by the TIME SPAN (hours), not the event count —
  * the unpartitioned ordered window is over that metadata-sized
  * series (the x67 argument). The 24-row seasonal table broadcasts
  * back. */
object Decompose {

  /** Sign-safe truncating integer division a/b (b > 0) toward zero:
    * both `div` operands are non-negative, so engines that truncate
    * and engines that floor integral division agree by construction.
    * `divOp` is the engine's integral-divide token (Spark `div`,
    * DuckDB `//`). */
  private[graft] def sdiv(a: String, b: String, divOp: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $divOp ($b) " +
      s"ELSE -((-($a)) $divOp ($b)) END)"

  /** @return (h, n, y_cents, trend_micro, seasonal_micro,
    *         remainder_micro) per dense hour index
    *         h = µs div 3600000000, ordered by h; y_cents is the exact
    *         hourly sum in cents, the *_micro columns are BIGINT
    *         micro-units (value × 10⁶), NULL where the 25-h window is
    *         incomplete. EVERY output column is BIGINT: round 8's
    *         driver hash-fail survived the all-integer internals
    *         rewrite while x94 (driver-green) consumes those same
    *         integers, so the remaining engine-divergence suspect was
    *         the one non-integer output — the uncast decimal sum `y`
    *         (Spark sum → DECIMAL(28,2), DuckDB sum → DECIMAL(38,2)).
    *         Cents out; no decimal crosses the engine boundary. */
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
      .withColumn("yc", expr("CAST(y * 100 AS BIGINT)"))
    val w25 = Window.orderBy(col("h")).rowsBetween(-12, 12)
    val withTrend = series
      .withColumn("wcnt", count(lit(1)).over(w25))
      .withColumn("wsum", sum(col("yc")).over(w25))
      // cents·10⁶/(25·100) = cents·400 — the mean is an EXACT integer
      .withColumn("trend_micro",
        when(col("wcnt") === 25, col("wsum") * 400L))
      .withColumn("detr", when(col("trend_micro").isNotNull,
        col("yc") * 10000L - col("trend_micro")))
    val seasonal = withTrend.filter(col("detr").isNotNull)
      .groupBy((col("h") % 24).as("hod"))
      .agg(expr(sdiv("sum(detr)", "count(detr)", "div"))
        .cast("long").as("seasonal_micro"))
    withTrend
      .join(broadcast(seasonal), col("h") % 24 === col("hod"), "left")
      .select(col("h"), col("n"), col("yc").as("y_cents"),
        col("trend_micro"),
        when(col("detr").isNotNull, col("seasonal_micro"))
          .as("seasonal_micro"),
        when(col("detr").isNotNull,
          col("detr") - col("seasonal_micro")).as("remainder_micro"))
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
       |    coalesce(t.ys, CAST(0 AS DECIMAL(18,2))) AS y,
       |    CAST(coalesce(t.ys, CAST(0 AS DECIMAL(18,2))) * 100
       |      AS BIGINT) AS yc
       |  FROM dense d LEFT JOIN hourly t ON d.h = t.h),
       |tr AS (SELECT h, n, y, yc,
       |    CASE WHEN count(*) OVER w = 25
       |      THEN sum(yc) OVER w * 400 END AS trend_micro
       |  FROM series
       |  WINDOW w AS (ORDER BY h
       |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
       |dt AS (SELECT *, CASE WHEN trend_micro IS NOT NULL
       |    THEN yc * 10000 - trend_micro END AS detr
       |  FROM tr),
       |sea AS (SELECT h % 24 AS hod,
       |    CAST(${sdiv("sum(detr)", "count(detr)", "//")} AS BIGINT)
       |      AS seasonal_micro
       |  FROM dt WHERE detr IS NOT NULL GROUP BY 1)
       |SELECT d.h, d.n, d.yc AS y_cents, CAST(d.trend_micro AS BIGINT)
       |    AS trend_micro,
       |  CASE WHEN d.detr IS NOT NULL THEN s.seasonal_micro END
       |    AS seasonal_micro,
       |  CAST(CASE WHEN d.detr IS NOT NULL
       |    THEN d.detr - s.seasonal_micro END AS BIGINT)
       |    AS remainder_micro
       |FROM dt d LEFT JOIN sea s ON d.h % 24 = s.hod
       |ORDER BY d.h""".stripMargin.replace('\n', ' ')

  // ------------------------------------- decomposition strength (x94)

  /** Seasonal / trend STRENGTH of the x70 decomposition (x94) —
    * Hyndman's feature-store numbers F_s = max(0, 1 − Var(R)/Var(S+R))
    * and F_t = max(0, 1 − Var(R)/Var(T+R)): is the series actually
    * seasonal, and is there a real trend, stated as a fraction of
    * explained variance? The scalar a forecasting router reads to
    * pick x85 (trend only) vs x92 (trend+season), and the one-number
    * summary dashboards show next to x70's 3 000-row table.
    *
    * Determinism: all three components are x70's exact micro-unit
    * integers, so each variance is the EXACT integer m·Σx² − (Σx)²
    * (products in DECIMAL(38,0)/HUGEINT) and each strength is one
    * truncating division with non-negative operands — the subtraction
    * clamps at 0 BEFORE dividing, so no sign convention is ever
    * exercised. Scale: one aggregate over the span-bounded dense hour
    * series (x70's own grain); the corpus contributes only x70's one
    * partial-aggregatable pass. */
  def strength(events: DataFrame, usCol: String = "us",
      valueCol: String = "value"): DataFrame = {
    val dec = hourlyAdditive(events, usCol, valueCol)
      .filter(col("remainder_micro").isNotNull)
      .select(col("remainder_micro").as("r"),
        (col("seasonal_micro") + col("remainder_micro")).as("d"),
        (col("trend_micro") + col("remainder_micro")).as("t"))
    def big(c: String) = s"CAST($c AS DECIMAL(38,0))"
    def vexpr(c: String) =
      s"(${big("m")} * ${big(s"s2_$c")} - ${big(s"s1_$c")} * ${big(s"s1_$c")})"
    def f(vx: String) =
      s"CASE WHEN $vx > vr THEN CAST((($vx - vr) * 1000000) div $vx " +
        s"AS BIGINT) WHEN $vx > 0 THEN 0 END"
    dec.agg(
      count(lit(1)).as("m"),
      sum(col("r")).as("s1_r"),
      sum(expr(s"${big("r")} * ${big("r")}")).as("s2_r"),
      sum(col("d")).as("s1_d"),
      sum(expr(s"${big("d")} * ${big("d")}")).as("s2_d"),
      sum(col("t")).as("s1_t"),
      sum(expr(s"${big("t")} * ${big("t")}")).as("s2_t"))
      .withColumn("vr", expr(vexpr("r")))
      .select(col("m").cast("long").as("n_hours"),
        expr(f(vexpr("d"))).as("seasonal_strength_e6"),
        expr(f(vexpr("t"))).as("trend_strength_e6"))
  }

  /** DuckDB twin of [[strength]]. */
  def strengthSql(eventsRel: String =
      "(SELECT epoch_us(ts) AS us, value FROM events)"): String = {
    def big(c: String) = s"CAST($c AS HUGEINT)"
    def vexpr(c: String) =
      s"(${big("m")} * ${big(s"s2_$c")} - ${big(s"s1_$c")} * ${big(s"s1_$c")})"
    def f(vx: String) =
      s"CASE WHEN $vx > vr THEN CAST((($vx - vr) * 1000000) // $vx " +
        s"AS BIGINT) WHEN $vx > 0 THEN 0 END"
    s"""WITH dec AS (${hourlyAdditiveSql(eventsRel)}),
       |c AS (SELECT remainder_micro AS r,
       |    seasonal_micro + remainder_micro AS d,
       |    trend_micro + remainder_micro AS t
       |  FROM dec WHERE remainder_micro IS NOT NULL),
       |a AS (SELECT count(*) AS m,
       |    sum(r) AS s1_r, sum(${big("r")} * ${big("r")}) AS s2_r,
       |    sum(d) AS s1_d, sum(${big("d")} * ${big("d")}) AS s2_d,
       |    sum(t) AS s1_t, sum(${big("t")} * ${big("t")}) AS s2_t
       |  FROM c),
       |v AS (SELECT *, ${vexpr("r")} AS vr FROM a)
       |SELECT CAST(m AS BIGINT) AS n_hours,
       |  ${f(vexpr("d"))} AS seasonal_strength_e6,
       |  ${f(vexpr("t"))} AS trend_strength_e6
       |FROM v""".stripMargin.replace('\n', ' ')
  }
}
