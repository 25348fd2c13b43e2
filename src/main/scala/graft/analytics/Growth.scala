package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting (x75) — the Social-Capital/Duolingo DAU
  * decomposition: each day's active users split into NEW (first-ever
  * active day), RETAINED (also active the previous day) and
  * RESURRECTED (returning after a gap ≥ 2 days); CHURNED(d) is
  * computed by the accounting identity active(d−1) − retained(d), so
  * no per-user look-ahead (lead) pass is needed. Quick ratio =
  * (new + resurrected) / churned — the growth-health headline.
  *
  * Scale shape: the corpus reduces ONCE to the distinct (user, day)
  * activity set; the only per-user work is a lag window over each
  * user's own active days (bounded by the calendar, not the corpus),
  * and everything after runs at day grain — metadata-sized at any SF.
  * All counts are exact integers; the one division is NULL-guarded
  * and rounded 6 dp identically in both engines. The first observed
  * day has NULL churn/quick-ratio (no prior day to account against),
  * as does any day whose predecessor saw no activity at all.
  */
object Growth {

  /** @param activity rows with (`user`, `day`) — pre-distinct not
    *                 required. */
  def dailyAccounting(activity: DataFrame, user: String = "user_id",
      day: String = "day"): DataFrame = {
    val ua = activity.select(col(user).as("u"), col(day).as("day"))
      .distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("day"))
    val perDay = ua
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(datediff(col("day"), col("prev_day")) === 1, 1L)
          .otherwise(0L)).as("n_retained"))
      .withColumn("n_resurrected",
        col("n_active") - col("n_new") - col("n_retained"))
      // day-grain, referenced twice (self-join for prev-day actives):
      // truncate so the (user, day) reduction + lag run exactly once
      .localCheckpoint()
    val prev = perDay.select(date_add(col("day"), 1).as("day"),
      col("n_active").as("prev_active"))
    perDay.join(prev, Seq("day"), "left")
      .withColumn("n_churned", col("prev_active") - col("n_retained"))
      .select(col("day"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned"),
        when(col("n_churned") > 0, round(
          (col("n_new") + col("n_resurrected")).cast("double") /
            col("n_churned").cast("double"), 6)).as("quick_ratio"))
      .orderBy("day")
  }
}
