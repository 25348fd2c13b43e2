package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.MarkovAttribution

/** Markov removal effects on hand-computed chains: exact fixed-point
  * units, full credit to an unavoidable channel, split credit across
  * parallel routes, and journey truncation at the first conversion. */
class MarkovAttributionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("event_id", "user_id", "event_type", "us")

  test("a channel on every converting path carries full credit; one " +
    "never visited by converters carries none — exact units") {
    // u1: A->conv, u2: A->conv, u3: B->null
    val events = ev(
      (1L, 1L, "A", 10L), (2L, 1L, "purchase", 20L),
      (3L, 2L, "A", 10L), (4L, 2L, "purchase", 20L),
      (5L, 3L, "B", 10L))
    val rows = MarkovAttribution.removalEffects(events, Seq("A", "B"))
      .collect()
    val a = rows.find(_.getString(0) == "A").get
    val b = rows.find(_.getString(0) == "B").get
    assert(a.getLong(1) === 666666666L, "base = 2/3 in 1e-9 units")
    assert(a.getLong(2) === 0L && a.getDouble(3) === 1.0 &&
      a.getDouble(4) === 1.0)
    assert(b.getLong(2) === 666666666L && b.getDouble(3) === 0.0 &&
      b.getDouble(4) === 0.0)
  }

  test("two parallel converting routes split credit 50/50") {
    // u1: A->conv, u2: B->conv, u3: A->null
    val events = ev(
      (1L, 1L, "A", 10L), (2L, 1L, "purchase", 20L),
      (3L, 2L, "B", 10L), (4L, 2L, "purchase", 20L),
      (5L, 3L, "A", 10L))
    val rows = MarkovAttribution.removalEffects(events, Seq("A", "B"))
      .collect()
    val a = rows.find(_.getString(0) == "A").get
    val b = rows.find(_.getString(0) == "B").get
    assert(a.getLong(1) === 666666666L)
    assert(a.getLong(2) === 333333333L && b.getLong(2) === 333333333L)
    assert(a.getDouble(4) === 0.5 && b.getDouble(4) === 0.5)
  }

  test("events after the first conversion are outside the journey, " +
    "and an instant converter contributes START -> CONV directly") {
    // u1: A, conv, then B B B (ignored); u2: conv immediately
    val events = ev(
      (1L, 1L, "A", 10L), (2L, 1L, "purchase", 20L),
      (3L, 1L, "B", 30L), (4L, 1L, "B", 40L), (5L, 1L, "B", 50L),
      (6L, 2L, "purchase", 10L))
    val rows = MarkovAttribution.removalEffects(events, Seq("A", "B"))
      .collect()
    val a = rows.find(_.getString(0) == "A").get
    val b = rows.find(_.getString(0) == "B").get
    assert(a.getLong(1) === 1000000000L,
      "both journeys convert: base = 1")
    assert(b.getLong(2) === a.getLong(1) && b.getDouble(3) === 0.0,
      "post-conversion events must not give B any effect")
    assert(a.getLong(2) === 500000000L,
      "removing A leaves only the instant-converter route (1/2)")
  }
}
