package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Funnel

/** Window-edge semantics of the time-bounded funnel — the branches the
  * sf-data oracle check cannot pin (events rarely land exactly ON a
  * window boundary): inclusive upper edge, strict lower edge, earliest
  * qualifying occurrence, fall-out propagation. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val win = 100L

  private def ev = Seq(
    // u1: clean full conversion
    (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
    // u2: click exactly AT the window edge (inclusive), purchase at
    // its edge too — both count
    (2L, "view", 0L), (2L, "click", 100L), (2L, "purchase", 200L),
    // u3: click one past the window — falls out; later purchase
    // irrelevant (stage 2 never happened)
    (3L, "view", 0L), (3L, "click", 101L), (3L, "purchase", 102L),
    // u4: clicks without any view — not in the funnel at all
    (4L, "click", 0L), (4L, "purchase", 1L),
    // u5: click BEFORE the first view (strict lower edge) — excluded;
    // a second click inside the window counts
    (5L, "view", 50L), (5L, "click", 40L), (5L, "click", 60L),
    // u6: two qualifying clicks — the EARLIEST wins; purchase windows
    // anchor on that earliest click
    (6L, "view", 0L), (6L, "click", 30L), (6L, "click", 5L),
    (6L, "purchase", 104L), // 5+100=105 ≥ 104 → counts vs earliest
    // u7: simultaneous click (us == view) is not "after" — excluded
    (7L, "view", 0L), (7L, "click", 0L)
  ).toDF("user_id", "event_type", "us")

  test("stage times: inclusive upper edge, strict lower edge, earliest " +
    "qualifying, fall-out → NULL, non-starters absent") {
    val st = Funnel.windowedStageTimes(ev, "event_type", "user_id", "us",
      Seq("view", "click", "purchase"), win)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(!st.contains(4L), "no stage-1 event → not in the funnel")
    assert(st(1L) === ((0L, Some(10L), Some(20L))))
    assert(st(2L) === ((0L, Some(100L), Some(200L))),
      "window edges are inclusive")
    assert(st(3L) === ((0L, None, None)),
      "one past the window falls out; later stages cannot resurrect")
    assert(st(5L) === ((50L, Some(60L), None)),
      "a click before the view is not a conversion")
    assert(st(6L) === ((0L, Some(5L), Some(104L))),
      "earliest qualifying click anchors the next window")
    assert(st(7L) === ((0L, None, None)),
      "simultaneous events are not 'after' (strict lower edge)")
  }

  test("one-pass firstTouchFlags equals the windowed chain under an " +
    "effectively-infinite window, flags are definite booleans, and " +
    "out-of-order first touches fall out") {
    val flags = Funnel.firstTouchFlags(ev, "event_type", "user_id",
      "us", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    // every user appears (even non-starters — flags false, not absent)
    assert(flags(4L) === ((false, false, false)),
      "click-only user: in the table, never converted stage 1")
    assert(flags(1L) === ((true, true, true)))
    // u5: first click (40) precedes first view (50) → stage 2 false
    // even though a later click (60) follows the view — the documented
    // first-touch semantics, NOT the windowed chain's
    assert(flags(5L) === ((true, false, false)))
    assert(flags(7L) === ((true, false, false)),
      "simultaneous first touches are not an increase")
    // cross-check vs the windowed chain with a huge window on users
    // whose first touches are ordered (where both definitions agree)
    val chain = Funnel.windowedStageTimes(ev, "event_type", "user_id",
      "us", Seq("view", "click", "purchase"), Long.MaxValue / 4)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).isDefined, Option(r.get(3)).isDefined)).toMap
    for (u <- Seq(1L, 2L, 3L, 6L, 7L)) {
      assert((flags(u)._2, flags(u)._3) === chain(u),
        s"user $u: one-pass and chained funnels must agree when first " +
          "touches are in stage order")
    }
  }
}
