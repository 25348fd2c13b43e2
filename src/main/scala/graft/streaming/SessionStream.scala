package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based session windows via
  * `flatMapGroupsWithState` + event-time timeout — the KeyValueGrouped
  * state API the built-in aggregations can't express (a session's extent
  * is data-dependent).
  *
  * Semantics: events for a user belong to one session while successive
  * timestamps are ≤ `gap` apart. A session is emitted (append mode) once
  * the watermark passes `session_end + gap` — no later in-watermark event
  * can extend it. State per user = the list of still-open sessions
  * (usually one); the event-time timeout guarantees eviction.
  *
  * All session arithmetic is in epoch MICROSECONDS: `Timestamp.getTime`
  * truncates µs, and Spark's watermark is the ms-floored max event time
  * minus the delay — the oracle reproduces exactly that.
  *
  * Scale: state is shuffled by user key; per-key state is O(open
  * sessions), bounded by the watermark horizon — independent of stream
  * length. The batch twin is [[graft.queries.ExtendedQueries.sessionize]].
  */
object SessionStream {

  final case class Ev(user_id: Long, ts: Timestamp, ts_us: Long,
      value: Double)
  final case class Session(start: Long, end: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, session_value: Double)

  val defaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** Interval-merge new events into the open sessions. */
  private def merge(open: List[Session], evs: Seq[(Long, Double)],
      gapUs: Long): List[Session] = {
    var sessions = open.sortBy(_.start)
    evs.sortBy(_._1).foreach { case (t, v) =>
      sessions = insert(sessions, t, v, gapUs)
    }
    sessions
  }

  private def insert(sorted: List[Session], t: Long, v: Double,
      gapUs: Long): List[Session] = {
    val (touching, rest) = sorted.partition(s =>
      t >= s.start - gapUs && t <= s.end + gapUs)
    val joined = touching match {
      case Nil => Session(t, t, 1, v)
      case ts => Session(
        math.min(ts.map(_.start).min, t),
        math.max(ts.map(_.end).max, t),
        ts.map(_.n).sum + 1,
        ts.map(_.sum).sum + v)
    }
    (joined :: rest).sortBy(_.start)
  }

  private def fn(gapUs: Long)(uid: Long, evs: Iterator[Ev],
      state: GroupState[List[Session]]): Iterator[SessionOut] = {
    val prior = state.getOption.getOrElse(Nil)
    val incoming = evs.map(e => (e.ts_us, e.value)).toSeq
    val sessions = merge(prior, incoming, gapUs)
    val watermarkUs = state.getCurrentWatermarkMs() * 1000L
    val (closed, open) = sessions.partition(_.end + gapUs <= watermarkUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // next close moment; ceil to ms so the timeout is never <= watermark
      state.setTimeoutTimestamp(open.map(_.end + gapUs).min / 1000L + 1)
    }
    closed.sortBy(_.start).iterator.map(s =>
      SessionOut(uid, s.start, s.end, s.n, s.sum))
  }

  /** events (user_id, ts timestamp, value) → emitted closed sessions
    * with epoch-µs bounds. */
  def sessionizeStream(events: DataFrame, watermark: String = "1 hour",
      gapUs: Long = defaultGapUs): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Session], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn(gapUs))
  }
}
