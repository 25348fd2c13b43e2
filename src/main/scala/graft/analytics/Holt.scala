package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Holt double-exponential (linear-trend) smoothing forecast (x85) —
  * the classic level+trend forecaster between w12's EWMA (level only)
  * and x70's STL decomposition: L_t = α·y_t + (1−α)(L_{t−1}+B_{t−1}),
  * B_t = β(L_t − L_{t−1}) + (1−β)B_{t−1}, ŷ_{T+h} = L_T + h·B_T.
  *
  * Scale: the corpus reduces to the SPAN-BOUNDED gap-filled daily
  * grain in one aggregate (day count is calendar-bounded no matter the
  * corpus size), and the inherently-sequential recursion runs on the
  * driver over that collected series — the documented x72-class
  * metadata collect (~2.4k longs here). Nothing event-sized sorts or
  * collects.
  *
  * Determinism is the x72 integer fixed-point discipline: state lives
  * in exact MILLI-CENT units, α = 1/5 and β = 1/10 are integer
  * rationals, every step is  (y·1000 + 4·(L+B)) div 5  and
  * ((L_t − L_{t−1}) + 9·B) div 10  with div truncating toward zero in
  * both engines (negative trends occur; parity established in x84) —
  * so the oracle's WITH RECURSIVE walks bit-identical states. int64
  * headroom: 4·(L+B) bounds daily revenue at ~$1e13 (SCALE.md). */
object Holt {

  /** @param daily (day: DateType, y: Long cents), gaps allowed (filled
    *   with 0); needs ≥ 2 distinct days
    * @param horizon forecast steps beyond the last day
    * @return (h, forecast_units milli-cents, forecast_cents double) */
  def forecast(daily: DataFrame, horizon: Int = 7): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val rows = daily.select(col("day"), col("y"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    require(rows.length >= 2, "Holt needs at least two days")
    val first = rows.head._1
    val last = rows.last._1
    val byDay = rows.toMap
    val series = Iterator.iterate(first)(_.plusDays(1))
      .takeWhile(!_.isAfter(last))
      .map(d => byDay.getOrElse(d, 0L)).toArray
    var l = series(0) * 1000L
    var b = (series(1) - series(0)) * 1000L
    var t = 1
    while (t < series.length) {
      val lNew = (series(t) * 1000L + 4L * (l + b)) / 5L
      b = ((lNew - l) + 9L * b) / 10L
      l = lNew
      t += 1
    }
    (1 to horizon).map { h =>
      val u = l + h.toLong * b
      (h, u, u.toDouble / 1000.0)
    }.toDF("h", "forecast_units", "forecast_cents")
  }

  /** DuckDB twin over `orders`: identical gap-filled day spine and
    * unit recursion via WITH RECURSIVE. */
  def forecastSql(horizon: Int = 7): String = {
    val hs = (1 to horizon).mkString(", ")
    s"""WITH RECURSIVE
       |days AS (SELECT CAST(o_orderdate AS DATE) AS dd,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |bounds AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM days),
       |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
       |    INTERVAL 1 DAY)) AS DATE) AS dd FROM bounds),
       |serie AS (SELECT CAST(row_number() OVER (ORDER BY s.dd)
       |      AS BIGINT) AS i,
       |    coalesce(y, CAST(0 AS BIGINT)) AS y
       |  FROM spine s LEFT JOIN days ON s.dd = days.dd),
       |st(i, l, b) AS (
       |  SELECT CAST(1 AS BIGINT), y1.y * 1000, (y2.y - y1.y) * 1000
       |  FROM (SELECT y FROM serie WHERE i = 1) y1,
       |    (SELECT y FROM serie WHERE i = 2) y2
       |  UNION ALL
       |  SELECT x.i + 1, x.lnew, ((x.lnew - x.l) + 9 * x.b) // 10
       |  FROM (SELECT st.i, st.l, st.b,
       |      (s.y * 1000 + 4 * (st.l + st.b)) // 5 AS lnew
       |    FROM st JOIN serie s ON s.i = st.i + 1) x),
       |fin AS (SELECT l, b FROM st ORDER BY i DESC LIMIT 1)
       |SELECT CAST(h AS INT) AS h,
       |  CAST(l + h * b AS BIGINT) AS forecast_units,
       |  CAST(l + h * b AS DOUBLE) / 1000.0 AS forecast_cents
       |FROM fin CROSS JOIN (SELECT unnest([$hs]) AS h)
       |ORDER BY h""".stripMargin.replace('\n', ' ')
  }

  // ------------------------------------------- rolling-origin backtest (x93)

  /** Rolling-origin h=1 backtest of the Holt forecaster (x93) — the
    * eval every forecast deployment needs before anyone trusts x85's
    * numbers: at every day t past a warmup, the model trained on days
    * 1..t predicts day t+1, and the realized error is scored against
    * the naive carry-forward baseline (skill > 0 = the smoother earns
    * its keep; MASE's comparison, reported as an e6 skill ratio).
    *
    * The trick that makes this ONE pass instead of T model fits: the
    * Holt state after consuming day t IS the model trained on prefix
    * t, so a single state walk yields every origin's forecast — the
    * backtest costs exactly what x85 costs. Same scale/determinism
    * contract: span-bounded driver recursion, exact milli-cent
    * integers, truncating-div parity; the oracle reads every
    * intermediate state from the same WITH RECURSIVE table. Ties for
    * the worst day break to the earliest. */
  def backtest(daily: DataFrame, warmup: Int = 28): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val rows = daily.select(col("day"), col("y"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    require(rows.length >= warmup + 2,
      s"backtest needs at least warmup+2 = ${warmup + 2} days")
    val first = rows.head._1
    val last = rows.last._1
    val byDay = rows.toMap
    val series = Iterator.iterate(first)(_.plusDays(1))
      .takeWhile(!_.isAfter(last))
      .map(d => byDay.getOrElse(d, 0L)).toArray
    def tdiv(a: Long, b: Long) = if (a >= 0) a / b else -((-a) / b)
    var l = series(0) * 1000L
    var b = (series(1) - series(0)) * 1000L
    var n = 0L; var sa = 0L; var se = 0L; var sn = 0L
    var worstAbs = -1L; var worstDi = 0
    // x85's exact loop with the prediction inserted BEFORE each
    // update: at loop top the state is st(t) (absorbed through 1-based
    // day t), which predicts day t+1 = 0-based series(t) — the same
    // (st.i, s.i = st.i+1) alignment the oracle's ev CTE reads
    var t = 1
    while (t < series.length) {
      if (t >= warmup) {
        val err = series(t) * 1000L - (l + b)
        val nerr = (series(t) - series(t - 1)) * 1000L
        n += 1; sa += math.abs(err); se += err; sn += math.abs(nerr)
        if (math.abs(err) > worstAbs) {
          worstAbs = math.abs(err); worstDi = t + 1 // 1-based day index
        }
      }
      val lNew = (series(t) * 1000L + 4L * (l + b)) / 5L
      b = ((lNew - l) + 9L * b) / 10L
      l = lNew
      t += 1
    }
    // worstDi ties resolve to the earliest because > is strict.
    // skill in BigInt: (sn−sa)·10⁶ overflows int64 at corpus error
    // magnitudes (≈4×10¹⁹ at sf0.01) — BigInt `/` truncates toward
    // zero, matching the oracle's HUGEINT CASE form
    val skill = if (sn > 0)
      Some(((BigInt(sn) - BigInt(sa)) * 1000000 / BigInt(sn)).toLong)
    else None
    Seq((n, sa / n, tdiv(se, n), sn / n, skill,
      java.sql.Date.valueOf(first.plusDays(worstDi - 1))))
      .toDF("n_evals", "mae_milli", "bias_milli", "mae_naive_milli",
        "skill_e6", "worst_day")
  }

  /** DuckDB twin of [[backtest]] over `orders`. */
  def backtestSql(warmup: Int = 28): String =
    s"""WITH RECURSIVE
       |days AS (SELECT CAST(o_orderdate AS DATE) AS dd,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |bounds AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM days),
       |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
       |    INTERVAL 1 DAY)) AS DATE) AS dd FROM bounds),
       |serie AS (SELECT CAST(row_number() OVER (ORDER BY s.dd)
       |      AS BIGINT) AS i,
       |    coalesce(y, CAST(0 AS BIGINT)) AS y
       |  FROM spine s LEFT JOIN days ON s.dd = days.dd),
       |st(i, l, b) AS (
       |  SELECT CAST(1 AS BIGINT), y1.y * 1000, (y2.y - y1.y) * 1000
       |  FROM (SELECT y FROM serie WHERE i = 1) y1,
       |    (SELECT y FROM serie WHERE i = 2) y2
       |  UNION ALL
       |  SELECT x.i + 1, x.lnew, ((x.lnew - x.l) + 9 * x.b) // 10
       |  FROM (SELECT st.i, st.l, st.b,
       |      (s.y * 1000 + 4 * (st.l + st.b)) // 5 AS lnew
       |    FROM st JOIN serie s ON s.i = st.i + 1) x),
       |ev AS (SELECT st.i + 1 AS di,
       |    s.y * 1000 - (st.l + st.b) AS err,
       |    (s.y - p.y) * 1000 AS nerr
       |  FROM st
       |  JOIN serie s ON s.i = st.i + 1
       |  JOIN serie p ON p.i = st.i
       |  WHERE st.i >= $warmup),
       |agg AS (SELECT count(*) AS n, sum(abs(err)) AS sa,
       |    sum(err) AS se, sum(abs(nerr)) AS sn FROM ev),
       |worst AS (SELECT di FROM ev ORDER BY abs(err) DESC, di
       |  LIMIT 1)
       |SELECT CAST(n AS BIGINT) AS n_evals,
       |  CAST(sa // n AS BIGINT) AS mae_milli,
       |  CAST(CASE WHEN se >= 0 THEN se // n
       |    ELSE -((-se) // n) END AS BIGINT) AS bias_milli,
       |  CAST(sn // n AS BIGINT) AS mae_naive_milli,
       |  CASE WHEN sn > 0 THEN CAST(CASE WHEN sn - sa >= 0
       |    THEN ((sn - sa) * 1000000) // sn
       |    ELSE -(((sa - sn) * 1000000) // sn) END AS BIGINT) END
       |    AS skill_e6,
       |  CAST(d0 + (worst.di - 1) * INTERVAL 1 DAY AS DATE)
       |    AS worst_day
       |FROM agg CROSS JOIN worst CROSS JOIN bounds"""
      .stripMargin.replace('\n', ' ')

  // ------------------------------------------ Holt-Winters additive (x92)

  /** Holt-Winters additive seasonal forecast (x92) — [[forecast]]'s
    * level+trend recursion completed with a weekly (period-7) seasonal
    * state, the classic triple-exponential smoother: a trend line
    * alone lags every weekend dip by construction; the seasonal terms
    * absorb the weekly shape so the trend tracks the true drift.
    *
    *   L_t = α(y_t − S_{t−7}) + (1−α)(L+B),   α = 1/5
    *   B_t = β(L_t − L_{t−1}) + (1−β)B,        β = 1/10
    *   S_t = γ(y_t − L_t) + (1−γ)S_{t−7},      γ = 1/10
    *   ŷ_{T+h} = L_T + h·B_T + S_{T+h−7·⌈…⌉}
    *
    * Same scale/determinism contract as [[forecast]]: the corpus
    * reduces to the span-bounded daily grain in one aggregate; the
    * inherently-sequential recursion runs on the driver over the
    * collected series (metadata-sized); ALL state is exact MILLI-CENT
    * int64, the smoothing constants are integer rationals, and every
    * step is one truncating division (toward-zero parity with
    * DuckDB's `//` established in x84 — negative trend/seasonal terms
    * occur). Deterministic DETRENDED init convention (fixed here AND
    * in the oracle, Hyndman-style): with m₁ = week-1 mean and
    * B₀ = (week-2 mean − m₁)/7, the level starts at the END of week 1
    * (L₀ = m₁ + 3·B₀) and the seasonal slots are trend-free
    * (S_i = y_i − m₁ − (i−3)·B₀) — so a pure trend+season series is
    * an EXACT fixed point of the recursion and the forecast is its
    * exact continuation (HoltWintersSpec pins this; the naive
    * S_i = y_i − m₁ init leaks ±3·B₀ of trend into the seasonals).
    * Recursion starts day 8. int64 headroom: 9·S bounds daily revenue
    * at ~$1e14. */
  def holtWinters(daily: DataFrame, horizon: Int = 7): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val rows = daily.select(col("day"), col("y"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    require(rows.length >= 15, "Holt-Winters needs two init weeks + 1")
    val first = rows.head._1
    val last = rows.last._1
    val byDay = rows.toMap
    val series = Iterator.iterate(first)(_.plusDays(1))
      .takeWhile(!_.isAfter(last))
      .map(d => byDay.getOrElse(d, 0L)).toArray
    val m1 = series.take(7).map(_ * 1000L).sum / 7L
    var b = {
      val w1 = series.take(7).sum
      val w2 = series.slice(7, 14).sum
      val d = (w2 - w1) * 1000L
      if (d >= 0) d / 49L else -((-d) / 49L)
    }
    var l = m1 + 3L * b
    val s = Array.tabulate(7)(i =>
      series(i) * 1000L - m1 - (i - 3).toLong * b)
    var t = 7
    while (t < series.length) {
      val si = t % 7
      val lNew = (series(t) * 1000L - s(si) + 4L * (l + b)) / 5L
      b = ((lNew - l) + 9L * b) / 10L
      s(si) = ((series(t) * 1000L - lNew) + 9L * s(si)) / 10L
      l = lNew
      t += 1
    }
    val n = series.length
    (1 to horizon).map { h =>
      val u = l + h.toLong * b + s((n - 1 + h) % 7)
      (h, u, u.toDouble / 1000.0)
    }.toDF("h", "forecast_units", "forecast_cents")
  }

  /** DuckDB twin of [[holtWinters]] over `orders`: the seasonal state
    * rides the recursion as seven columns, one updated per step via a
    * CASE on the day index mod 7. Scala's `/` truncates toward zero,
    * so negative operands route through the explicit -((-x)//d) form
    * DuckDB-side where x can be negative ONLY in b0 (both engines'
    * integer `/`//`//` truncate toward zero — x84 — so the plain ops
    * match everywhere else). */
  def holtWintersSql(horizon: Int = 7): String = {
    val hs = (1 to horizon).mkString(", ")
    def upd(i: Int) =
      s"CASE WHEN (s.i - 1) % 7 = $i THEN " +
        s"((s.y * 1000 - x.lnew) + 9 * x.s$i) // 10 ELSE x.s$i END"
    val sCols = (0 until 7).map(i => s"s$i").mkString(", ")
    val sInit = (0 until 7).map(i =>
      s"(SELECT y * 1000 FROM serie WHERE i = ${i + 1}) - ini.m1 - " +
        s"(${i - 3}) * ini.b0")
      .mkString(", ")
    val sPick = s"CASE ${(0 until 7).map(i =>
      s"WHEN (s.i - 1) % 7 = $i THEN st.s$i").mkString(" ")} END"
    val sFcst = s"CASE ${(0 until 7).map(i =>
      s"WHEN (nn.n - 1 + h) % 7 = $i THEN fin.s$i").mkString(" ")} END"
    s"""WITH RECURSIVE
       |days AS (SELECT CAST(o_orderdate AS DATE) AS dd,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |bounds AS (SELECT min(dd) AS d0, max(dd) AS d1 FROM days),
       |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
       |    INTERVAL 1 DAY)) AS DATE) AS dd FROM bounds),
       |serie AS (SELECT CAST(row_number() OVER (ORDER BY s.dd)
       |      AS BIGINT) AS i,
       |    coalesce(y, CAST(0 AS BIGINT)) AS y
       |  FROM spine s LEFT JOIN days ON s.dd = days.dd),
       |nn AS (SELECT max(i) AS n FROM serie),
       |ini AS (SELECT m1, b0, m1 + 3 * b0 AS l0 FROM (SELECT
       |    (SELECT sum(y * 1000) FROM serie WHERE i <= 7) // 7 AS m1,
       |    (SELECT CASE WHEN d >= 0 THEN d // 49 ELSE -((-d) // 49) END
       |     FROM (SELECT ((SELECT sum(y) FROM serie
       |         WHERE i BETWEEN 8 AND 14) -
       |       (SELECT sum(y) FROM serie WHERE i <= 7)) * 1000 AS d))
       |      AS b0)),
       |st(i, l, b, $sCols) AS (
       |  SELECT CAST(7 AS BIGINT), ini.l0, ini.b0, $sInit FROM ini
       |  UNION ALL
       |  SELECT x.i + 1, x.lnew,
       |    ((x.lnew - x.l) + 9 * x.b) // 10,
       |    ${(0 until 7).map(upd).mkString(", ")}
       |  FROM (SELECT st.i, st.l, st.b,
       |      ${(0 until 7).map(i => s"st.s$i").mkString(", ")},
       |      (s.y * 1000 - ($sPick) + 4 * (st.l + st.b)) // 5 AS lnew
       |    FROM st JOIN serie s ON s.i = st.i + 1) x
       |    JOIN serie s ON s.i = x.i + 1),
       |fin AS (SELECT * FROM st ORDER BY i DESC LIMIT 1)
       |SELECT CAST(h AS INT) AS h,
       |  CAST(fin.l + h * fin.b + ($sFcst) AS BIGINT) AS forecast_units,
       |  CAST(fin.l + h * fin.b + ($sFcst) AS DOUBLE) / 1000.0
       |    AS forecast_cents
       |FROM fin CROSS JOIN nn CROSS JOIN (SELECT unnest([$hs]) AS h)
       |ORDER BY h""".stripMargin.replace('\n', ' ')
  }
}
