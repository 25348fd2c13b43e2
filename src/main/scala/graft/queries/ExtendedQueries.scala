package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{eventsTs, eventsUs, gold, table, withPipeline}
import graft.text.TextAnalysis

/** Additional large-scale operators rounding out the engine surface:
  * sessionization, pivot, vocabulary statistics, embedding centroids.
  * All oracle-checked. */
object ExtendedQueries {

  /** Sessionization: split each user's event stream at >30 min gaps —
    * the canonical event-log operator. One shuffle (window by user);
    * the running session counter is a cumulative sum over the gap flags. */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // µs-exact gap: cast-to-long floors to seconds and would disagree
    // with the oracle (and the streaming twin) on gaps in (1800, 1801) s
    val gap = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(gap.isNull || gap > 1800L * 1000000, 1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(
          Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")).cast("double"), 4).as("session_value"))
  }

  /** Aggregated registry: the x/g/er/dq families live in their own
    * files since round 8 (XAnalyticsCoreQueries, XAnalyticsSeriesQueries,
    * GraphExtQueries, EntityResolutionQueries, DataQualityQueries);
    * this object keeps the shared sessionize batch twin and the
    * driver-facing aggregate maps — keys unchanged. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    XAnalyticsCoreQueries.queries ++ XAnalyticsSeriesQueries.queries ++
      GraphExtQueries.queries ++ EntityResolutionQueries.queries ++
      DataQualityQueries.queries

  val oracle: Map[String, String] =
    XAnalyticsCoreQueries.oracle ++ XAnalyticsSeriesQueries.oracle ++
      GraphExtQueries.oracle ++ EntityResolutionQueries.oracle ++
      DataQualityQueries.oracle
}
