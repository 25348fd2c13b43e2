package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Autocorrelation function (x76) of the hourly event-count series at
  * lags 1..maxLag — the seasonality detector that tells a forecasting
  * pipeline WHICH lag features to build (the w1 lags 1/24/168 are
  * exactly the spikes this surfaces) and the diagnostics behind x54's
  * seasonal profile and x70's decomposition.
  *
  * Determinism is total: with integer counts y_t, the standard
  * mean-centered estimator r_k = c_k / c_0 multiplies through by n²
  * into pure integer arithmetic —
  *   n²·c_k = n²·Σ y_t·y_{t+k} − n·S·(A_k + B_k) + (n−k)·S²
  *   n²·c_0 = n²·Σ y² − n·S²
  * (S = Σy, A_k/B_k = the overlapping prefix/suffix sums that fall out
  * of the lag join for free), so both engines compare identical
  * integers and the ONE double division rounds once at 6 dp. No
  * floating mean ever enters.
  *
  * Scale shape: the corpus reduces at scan speed to the gap-filled
  * hourly series (span-bounded — hours in the window, not rows in the
  * corpus); the lag join is maxLag × series — metadata-sized at any
  * SF. Integer headroom: n²·Σy² must fit 2⁶³ — at 10⁵ hourly events
  * over a year that is ~10¹⁷, still safe; beyond that, quantize y or
  * compute per shard and combine. */
object Autocorrelation {

  /** @param events frame with a µs-timestamp column `us`
    * @return (lag, acf) for lag = 1..maxLag */
  def hourlyAcf(events: DataFrame, maxLag: Int = 24): DataFrame = {
    val counts = events
      .select(expr("us div 3600000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("y"))
    val bounds = counts.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    // referenced three times (totals + both sides of the lag join):
    // truncate so the corpus-sized hourly count runs exactly once
    val series = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      .join(counts, Seq("h"), "left")
      .na.fill(0L, Seq("y"))
      .localCheckpoint()
    val tot = series.agg(count(lit(1)).as("n"), sum(col("y")).as("sm"),
      sum(col("y") * col("y")).as("syy"))
    series
      .withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .join(series.select(col("h").as("hb"), col("y").as("yb")),
        col("hb") === col("h") + col("k"))
      .groupBy(col("k"))
      .agg(sum(col("y") * col("yb")).as("sab"),
        sum(col("y")).as("sa"), sum(col("yb")).as("sb"))
      .crossJoin(broadcast(tot))
      .select(col("k").cast("int").as("lag"),
        round(
          (col("n") * col("n") * col("sab") -
            col("n") * col("sm") * (col("sa") + col("sb")) +
            (col("n") - col("k")) * col("sm") * col("sm")).cast("double") /
            (col("n") * col("n") * col("syy") -
              col("n") * col("sm") * col("sm")).cast("double"), 6)
          .as("acf"))
      .orderBy("lag")
  }

  /** DuckDB twin of [[hourlyAcf]] over the `events` table. */
  def hourlyAcfSql(maxLag: Int = 24): String =
    s"""WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
       |c AS (SELECT h, CAST(count(*) AS BIGINT) AS y FROM ev GROUP BY 1),
       |bd AS (SELECT min(h) AS mn, max(h) AS mx FROM c),
       |sr AS (SELECT sp.h, coalesce(c.y, 0) AS y
       |  FROM (SELECT unnest(range(mn, mx + 1)) AS h FROM bd) sp
       |  LEFT JOIN c USING (h)),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS sm,
       |    CAST(sum(y * y) AS BIGINT) AS syy FROM sr),
       |p AS (SELECT kk.k, CAST(sum(a.y * b.y) AS BIGINT) AS sab,
       |    CAST(sum(a.y) AS BIGINT) AS sa,
       |    CAST(sum(b.y) AS BIGINT) AS sb
       |  FROM (SELECT unnest(range(1, ${maxLag + 1})) AS k) kk
       |  JOIN sr a ON true
       |  JOIN sr b ON b.h = a.h + kk.k
       |  GROUP BY 1)
       |SELECT CAST(k AS INT) AS lag,
       |  round(CAST(n*n*sab - n*sm*(sa + sb) + (n - k)*sm*sm AS DOUBLE)
       |    / CAST(n*n*syy - n*sm*sm AS DOUBLE), 6) AS acf
       |FROM p CROSS JOIN tt ORDER BY lag"""
      .stripMargin.replace('\n', ' ')

  /** Cross-correlation (x87) between two event-type hourly series at
    * lags −maxLag..maxLag — the LEAD-LAG detector next to [[hourlyAcf]]:
    * a peak at positive lag k means series A (clicks) leads series B
    * (purchases) by k hours, the signal that decides which lagged
    * features (w1) and attribution windows (x62) are worth building.
    *
    * Same discipline as the ACF: both series gap-fill onto ONE
    * span-bounded hourly spine, every per-lag sufficient statistic
    * (n_k, Σy, Σz, Σy², Σz², Σyz over the overlap) is an exact
    * integer from the lag join, and the one double expression is a
    * fixed tree — two correctly-rounded IEEE sqrts (identical in both
    * engines), one division, one 6 dp rounding. Degenerate windows
    * (either side constant) yield NULL, never NaN. Integer headroom is
    * x76's documented n·Σy² bound. */
  def hourlyCrossCorr(events: DataFrame, typeA: String = "click",
      typeB: String = "purchase", maxLag: Int = 12): DataFrame = {
    val hourly = events
      .select(expr("us div 3600000000").as("h"), col("event_type"))
      .groupBy(col("h"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L))
        .as("ya"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L))
          .as("yb"))
    val bounds = hourly.agg(min(col("h")).as("mn"),
      max(col("h")).as("mx"))
    val series = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      .join(hourly, Seq("h"), "left")
      .na.fill(0L, Seq("ya", "yb"))
      .localCheckpoint() // both sides of the lag join
    val va = col("nk") * col("syy") - col("sy") * col("sy")
    val vb = col("nk") * col("szz") - col("sz") * col("sz")
    series
      .withColumn("k", explode(sequence(lit(-maxLag), lit(maxLag))))
      .join(series.select(col("h").as("hb"), col("yb").as("zb")),
        col("hb") === col("h") + col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("nk"),
        sum(col("ya") * col("zb")).as("syz"),
        sum(col("ya")).as("sy"), sum(col("zb")).as("sz"),
        sum(col("ya") * col("ya")).as("syy"),
        sum(col("zb") * col("zb")).as("szz"))
      .select(col("k").cast("int").as("lag"),
        when(va > 0 && vb > 0,
          round((col("nk") * col("syz") - col("sy") * col("sz"))
            .cast("double") /
            (sqrt(va.cast("double")) * sqrt(vb.cast("double"))), 6))
          .as("xcorr"))
      .orderBy("lag")
  }

  /** DuckDB twin of [[hourlyCrossCorr]] over the `events` table. */
  def hourlyCrossCorrSql(typeA: String = "click",
      typeB: String = "purchase", maxLag: Int = 12): String =
    s"""WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS h, event_type
       |  FROM events),
       |c AS (SELECT h,
       |    CAST(sum(CASE WHEN event_type = '$typeA' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ya,
       |    CAST(sum(CASE WHEN event_type = '$typeB' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS yb
       |  FROM ev GROUP BY 1),
       |bd AS (SELECT min(h) AS mn, max(h) AS mx FROM c),
       |sr AS (SELECT sp.h, coalesce(c.ya, 0) AS ya,
       |    coalesce(c.yb, 0) AS yb
       |  FROM (SELECT unnest(range(mn, mx + 1)) AS h FROM bd) sp
       |  LEFT JOIN c USING (h)),
       |p AS (SELECT kk.k, CAST(count(*) AS BIGINT) AS nk,
       |    CAST(sum(a.ya * b.yb) AS BIGINT) AS syz,
       |    CAST(sum(a.ya) AS BIGINT) AS sy,
       |    CAST(sum(b.yb) AS BIGINT) AS sz,
       |    CAST(sum(a.ya * a.ya) AS BIGINT) AS syy,
       |    CAST(sum(b.yb * b.yb) AS BIGINT) AS szz
       |  FROM (SELECT unnest(range(-$maxLag, ${maxLag + 1})) AS k) kk
       |  JOIN sr a ON true
       |  JOIN sr b ON b.h = a.h + kk.k
       |  GROUP BY 1)
       |SELECT CAST(k AS INT) AS lag,
       |  CASE WHEN nk*syy - sy*sy > 0 AND nk*szz - sz*sz > 0 THEN
       |    round(CAST(nk*syz - sy*sz AS DOUBLE) /
       |      (sqrt(CAST(nk*syy - sy*sy AS DOUBLE)) *
       |       sqrt(CAST(nk*szz - sz*sz AS DOUBLE))), 6)
       |  END AS xcorr
       |FROM p ORDER BY lag""".stripMargin.replace('\n', ' ')
}
