package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bounded sequential funnels (x62; x23 is the unbounded special
  * case): stage k counts only if its first qualifying occurrence falls
  * within `windowUs` of the user's stage-(k−1) time — real conversion
  * windows expire, and "clicked three weeks after the view" is not a
  * conversion.
  *
  * Shape: the stage dependency is inherently sequential, so the chain
  * is one user-keyed min-aggregate per stage joined onto the previous
  * stage's table — every intermediate is ≤ |users who reached the
  * previous stage| rows, monotonically shrinking down the funnel, and
  * the event table is scanned once per stage with the stage-type
  * filter pushed to the scan. Window predicates are µs-integer
  * comparisons: exact, engine-portable, no interval arithmetic.
  */
object Funnel {

  /** Per-user first-occurrence times down the funnel: one row per user
    * who performed `stages.head` at all, with `t_1 .. t_n` µs columns
    * (t_k NULL once the user falls out). Stage k qualifies iff its
    * time is strictly after t_(k−1) and at most t_(k−1)+windowUs —
    * inclusive upper edge, strict lower (a simultaneous event is not
    * "after"). */
  def windowedStageTimes(ev: DataFrame, typeCol: String, userCol: String,
      usCol: String, stages: Seq[String], windowUs: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val first = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(usCol)).as("t_1"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      val nxt = ev.filter(col(typeCol) === st)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col(usCol) > col(prev) &&
          col(usCol) <= col(prev) + windowUs)
        .groupBy(col(userCol)).agg(min(col(usCol)).as(cur))
      acc.join(nxt, Seq(userCol), "left")
    }
  }
}
