package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-style sequential pattern matching over a live stream: detect the
  * first view → click → purchase sequence per user (strictly increasing
  * event time) with `flatMapGroupsWithState` — the complex-event-
  * processing shape the built-in stream operators can't express (a
  * match is a data-dependent path through an NFA, not a window).
  *
  * Determinism under out-of-order arrival — the design point: incoming
  * events are BUFFERED until the watermark passes them, then fed to the
  * per-user stage machine in (event-time, event-id) order. Processing a
  * watermark-closed prefix in event-time order is independent of
  * arrival order, so the match is a pure function of the event set —
  * reproducible on any partitioning and any micro-batch split. Greedy
  * earliest-completion semantics: the matched stages are min(view ts),
  * min(click ts > view), min(purchase ts > click), each restricted to
  * watermark-closed events — exactly what the batch oracle computes.
  *
  * Scale: stage state is O(1) per user (two optional timestamps + the
  * done flag); the buffer holds only events still ABOVE the watermark —
  * bounded by rate × delay, the stream-stream-join bound. Consumed
  * events are dropped immediately. Event-time timeouts re-fire keys
  * whose buffered prefix closes without new data. */
object CepStream {

  final case class Ev(user_id: Long, ts: Timestamp, ts_us: Long,
      event_type: String, event_id: Long)
  final case class CepState(done: Boolean, viewUs: Long, clickUs: Long,
      buffer: List[(Long, Long, String)]) // (ts_us, event_id, type)
  final case class MatchOut(user_id: Long, view_us: Long, click_us: Long,
      purchase_us: Long)

  private val NONE = Long.MinValue

  private def fn(uid: Long, evs: Iterator[Ev],
      state: GroupState[CepState]): Iterator[MatchOut] = {
    val st = state.getOption.getOrElse(CepState(false, NONE, NONE, Nil))
    if (st.done) { state.update(st); return Iterator.empty }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val all = st.buffer ++
      evs.map(e => (e.ts_us, e.event_id, e.event_type))
    val (ready, pending) = all.partition(_._1 <= wmUs)
    var view = st.viewUs
    var click = st.clickUs
    var matchOut: Option[MatchOut] = None
    ready.sortBy(e => (e._1, e._2)).foreach { case (t, _, typ) =>
      if (matchOut.isEmpty) typ match {
        case "view" if view == NONE => view = t
        case "click" if view != NONE && click == NONE && t > view =>
          click = t
        case "purchase" if click != NONE && t > click =>
          matchOut = Some(MatchOut(uid, view, click, t))
        case _ => ()
      }
    }
    matchOut match {
      case Some(m) =>
        state.update(CepState(true, NONE, NONE, Nil))
        Iterator.single(m)
      case None =>
        state.update(CepState(false, view, click, pending))
        if (pending.nonEmpty) {
          // fire again once the watermark passes the earliest buffered
          // event; ceil to ms so the timeout is never <= watermark
          state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1)
        }
        Iterator.empty
    }
  }

  /** events (event_id, ts timestamp, user_id, event_type, ...) →
    * first-match rows with epoch-µs stage timestamps. */
  def matchFunnel(events: DataFrame, watermark: String = "1 hour")
      : Dataset[MatchOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("event_id"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, MatchOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
