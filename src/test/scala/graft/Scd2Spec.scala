package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.etl.Scd2

/** SCD2 interval construction: changes open intervals, repeats
  * collapse, re-occurrences open NEW intervals, and the intervals
  * partition each key's timeline for point-in-time lookups. */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("A A B A collapses to three intervals with chained bounds and " +
    "one open current row") {
    val ev = Seq((1L, "A", ts(0)), (1L, "A", ts(1)), (1L, "B", ts(2)),
      (1L, "A", ts(3))).toDF("user_id", "event_type", "ts")
    val out = Scd2.intervals(ev, "user_id", "event_type", "ts")
      .orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("A", ts(0), Some(ts(2)), false),
      ("B", ts(2), Some(ts(3)), false),
      ("A", ts(3), None, true)),
      "repeat collapses, re-occurrence opens a NEW interval")
  }

  test("intervals partition the timeline: every event joins exactly " +
    "one interval at its own time, including mid-regime repeats") {
    val ev = Seq(
      (1L, "A", ts(0)), (1L, "A", ts(5)), (1L, "B", ts(10)),
      (2L, "C", ts(0))).toDF("user_id", "event_type", "ts")
    val iv = Scd2.intervals(ev, "user_id", "event_type", "ts")
      .select($"user_id".as("du"), $"event_type".as("regime"),
        $"valid_from", $"valid_to")
    val joined = ev.join(iv,
      $"user_id" === $"du" && $"ts" >= $"valid_from" &&
        ($"valid_to".isNull || $"ts" < $"valid_to"))
    assert(joined.count() === ev.count(),
      "exactly one interval per event")
    val repeat = joined.filter($"ts" === ts(5)).collect().head
    assert(repeat.getAs[String]("regime") === "A" &&
      repeat.getAs[Timestamp]("valid_from") === ts(0),
      "a mid-regime repeat resolves to the regime's START, not itself")
  }
}
