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

  /** ONE-PASS unbounded funnel (the x23 path): when conversion windows
    * never expire, stage k's "first qualifying occurrence" degenerates
    * to a condition on FIRST-TOUCH times alone — the user converted at
    * stage k iff t_1 < t_2 < … < t_k where t_j is simply the user's
    * first stage-j event. (Proof sketch: with no window, any stage-j
    * event after t_(j−1) qualifies, and the earliest one is ≥ the
    * global first touch; the strict chain on first touches is therefore
    * necessary and sufficient.) That collapses the whole funnel to ONE
    * events scan: one conditional `min` per stage inside a single
    * user-keyed aggregate, stage flags row-local on the result — n−1
    * scans and n−1 joins fewer than the windowed chain, which is the
    * difference between 1× and n× I/O at 100 TB. Returns one row per
    * user: (user, s_1 .. s_n booleans). Windowed funnels CANNOT take
    * this path (stage k's window anchors on the chosen stage-(k−1)
    * time, not the global first touch) — they use
    * [[windowedStageTimes]]. */
  def firstTouchFlags(ev: DataFrame, typeCol: String, userCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val mins = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t_${i + 1}")
    }
    val perUser = ev.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // coalesce: a NULL t_j makes the 3-valued chain NULL, and a funnel
    // flag must be a definite boolean (fall-out = false, never unknown)
    val flags = (1 to stages.size).map { k =>
      coalesce((2 to k).foldLeft(col("t_1").isNotNull) { (acc, j) =>
        acc && col(s"t_$j") > col(s"t_${j - 1}")
      }, lit(false)).as(s"s_$k")
    }
    perUser.select(col(userCol) +: flags: _*)
  }

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
