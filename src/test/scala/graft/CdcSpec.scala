package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Cdc

/** CDC upsert semantics on planted changelogs. */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val key = Seq("user_id")
  private val payload = Seq("state", "value")
  private val ord = Seq("ts", "event_id")

  test("upsertLatest: changes win over snapshot; untouched keys survive") {
    val snapshot = Seq(
      (1L, "old", 10.0, ts("2024-01-01 00:00:00"), 100L),
      (2L, "keep", 20.0, ts("2024-01-02 00:00:00"), 200L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val changes = Seq(
      (1L, "new", 11.0, ts("2024-01-05 00:00:00"), 300L),
      (3L, "ins", 30.0, ts("2024-01-06 00:00:00"), 400L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val out = Cdc.upsertLatest(snapshot, changes, key, payload, ord)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, "new", 11.0), (2L, "keep", 20.0), (3L, "ins", 30.0)))
  }

  test("upsertLatest: equal timestamps tie-break on event_id " +
    "(deterministic)") {
    val snapshot = Seq(
      (1L, "a", 1.0, ts("2024-01-01 00:00:00"), 5L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val changes = Seq(
      (1L, "b", 2.0, ts("2024-01-01 00:00:00"), 7L),
      (1L, "c", 3.0, ts("2024-01-01 00:00:00"), 6L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val out = Cdc.upsertLatest(snapshot, changes, key, payload, ord)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("state") === "b") // highest event_id
  }

  test("mergeWithTombstones: latest tombstone deletes, later upsert " +
    "re-inserts, snapshot-only keys survive") {
    import org.apache.spark.sql.functions.col
    val snapshot = Seq(
      (1L, "live", 1.0, ts("2024-01-01 00:00:00"), 1L),
      (2L, "live", 2.0, ts("2024-01-01 00:00:00"), 2L),
      (3L, "live", 3.0, ts("2024-01-01 00:00:00"), 3L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val changes = Seq(
      // key 1: deleted, then re-inserted later → survives with new state
      (1L, "DEL", 0.0, ts("2024-01-02 00:00:00"), 10L),
      (1L, "back", 1.5, ts("2024-01-03 00:00:00"), 11L),
      // key 2: latest op is the tombstone → gone
      (2L, "upd", 2.5, ts("2024-01-02 00:00:00"), 12L),
      (2L, "DEL", 0.0, ts("2024-01-04 00:00:00"), 13L),
      // key 4: insert of an unseen key
      (4L, "ins", 4.0, ts("2024-01-02 00:00:00"), 14L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val out = Cdc.mergeWithTombstones(snapshot, changes, key, payload,
      ord, col("state") === "DEL")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "back"), (3L, "live"), (4L, "ins")))
  }

  test("compactLatest: changelog collapses to one row per key") {
    val changelog = Seq(
      (1L, "v1", 1.0, ts("2024-01-01 00:00:00"), 1L),
      (1L, "v2", 2.0, ts("2024-01-03 00:00:00"), 2L),
      (1L, "v1b", 1.5, ts("2024-01-02 00:00:00"), 3L),
      (2L, "w1", 9.0, ts("2024-01-01 00:00:00"), 4L)
    ).toDF("user_id", "state", "value", "ts", "event_id")
    val out = Cdc.compactLatest(changelog, key, payload, ord)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "v2"), (2L, "w1")))
  }
}
