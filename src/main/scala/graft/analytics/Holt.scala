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
}
