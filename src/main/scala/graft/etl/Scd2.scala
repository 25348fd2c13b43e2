package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 interval construction: collapse a
  * change-event log into per-key validity intervals
  * [valid_from, valid_to) with an open current interval — the x11
  * operator promoted to a library function so the streaming
  * point-in-time enrichment (s12) and the batch registry entry share
  * one definition.
  *
  * Consecutive equal attribute values collapse into one interval
  * (only CHANGES open a new row); valid_to is the next change's
  * timestamp, NULL while current. Scale: one lag + one lead window,
  * both partitioned by the dimension key — never a global sort; the
  * result is bounded by the number of attribute CHANGES, not events. */
object Scd2 {

  /** @return (key, attr, valid_from, valid_to, is_current) */
  def intervals(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol))))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
