package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC / MERGE-style upsert primitives.
  *
  * The core operation behind `MERGE INTO` and changelog compaction: given
  * a keyed snapshot and a stream of change rows, produce the new
  * latest-state-per-key snapshot.
  *
  * Scale design: the collapse is a single `max_by(payload, ord)` hash
  * aggregate — it partial-aggregates map-side (each task keeps one row
  * per key before the shuffle), so shuffle volume is ~|distinct keys|,
  * never |changelog|. No window function touches the data: a
  * `row_number() OVER (PARTITION BY key ORDER BY ord DESC)` would
  * shuffle AND sort every input row (the x10 lesson from round 1). On a
  * real lakehouse the write side would pair this with partition-pruned
  * overwrite; the state collapse here is the engine-side operator.
  */
object Cdc {

  /** Latest row per key from a union of snapshot + changelog rows.
    *
    * Both inputs must share the schema `keyCols ++ payloadCols ++
    * ordCols`; `ordCols` is the version order (e.g. ts, then a unique
    * event id as a deterministic tie-break — REQUIRED for reproducible
    * results when timestamps collide). */
  def upsertLatest(snapshot: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val all = snapshot.select(
      (keyCols ++ payloadCols ++ ordCols).map(col): _*)
      .unionByName(changelog.select(
        (keyCols ++ payloadCols ++ ordCols).map(col): _*))
    val ord = struct(ordCols.map(col): _*)
    val payload = struct((payloadCols ++ ordCols).map(col): _*)
    all.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("latest"))
      .select(keyCols.map(col) ++
        (payloadCols ++ ordCols).map(c => col(s"latest.$c").as(c)): _*)
  }

  /** Changelog compaction: latest state per key within one DataFrame —
    * `upsertLatest` with an empty snapshot. */
  def compactLatest(changelog: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String], ordCols: Seq[String]): DataFrame =
    upsertLatest(changelog.limit(0), changelog, keyCols, payloadCols,
      ordCols)

  /** MERGE with DELETE semantics: changelog rows matching `isDelete` are
    * tombstones — a key whose LATEST op is a tombstone leaves the
    * snapshot; a later upsert re-inserts it. Snapshot rows are never
    * tombstones (a snapshot stores live state only).
    *
    * Still ONE max_by hash aggregate: the tombstone flag rides inside
    * the payload struct through the same latest-op collapse, and the
    * delete applies as a post-aggregate filter on |keys| rows — no
    * second pass over the changelog, no join. */
  def mergeWithTombstones(snapshot: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String],
      ordCols: Seq[String], isDelete: Column): DataFrame = {
    val flag = "_graft_is_delete"
    // coalesce: a NULL delete flag on a key's latest row would otherwise
    // drop the key under three-valued logic — a non-tombstone row must
    // never silently delete (same explicit null rule as Checks.report)
    upsertLatest(
      snapshot.withColumn(flag, lit(false)),
      changelog.withColumn(flag, coalesce(isDelete, lit(false))),
      keyCols, payloadCols :+ flag, ordCols)
      .filter(!col(flag))
      .drop(flag)
  }
}
