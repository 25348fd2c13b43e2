package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Checkpoints

/** Pins the eager-release mechanism the iterative operators rely on
  * (round-13: the round-12 driver bench's pass-2 blowups were dead
  * localCheckpoint generations waiting on a full GC). */
class CheckpointsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("free() releases the blocks behind a localCheckpoint'd frame " +
    "and is a no-op on plain frames") {
    import spark.implicits._
    val before = persistedIds
    val df = (1 to 1000).toDF("x").withColumn("y", col("x") * 2)
      .localCheckpoint()
    assert(df.count() === 1000)
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint must register a persisted RDD")
    Checkpoints.free(df)
    // unpersist(blocking=false) is async — poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while ((persistedIds intersect added).nonEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert((persistedIds intersect added).isEmpty,
      "free() must drop the checkpointed RDD from the block manager")
    // plain (non-checkpoint) frames: free is a silent no-op
    Checkpoints.free((1 to 10).toDF("x"))
  }

  test("successor frames built on a freed round still answer (the " +
    "call-site contract: free only after the successor materializes)") {
    import spark.implicits._
    val round1 = (1 to 100).toDF("x").localCheckpoint()
    val round2 = round1.withColumn("x2", col("x") * 2).localCheckpoint()
    Checkpoints.free(round1)
    assert(round2.agg(sum(col("x2"))).first().getLong(0) === 10100L)
  }
}
