package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.er.EntityStore

/** Incremental ER store (er9): match-vs-found decisions per batch,
  * store growth enabling later matches, redelivery idempotence, and
  * the documented batch-then-merge convention. */
class EntityStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshRoot() =
    Files.createTempDirectory("er_store").toString + "/s"

  private def seed(root: String): Unit = {
    import spark.implicits._
    EntityStore.init(Seq(
      (10L, "Customer#000000010"), (20L, "Customer#000000020"))
      .toDF("entity_id", "name"), root)
  }

  test("lifecycle: match seed, found new, later batch matches the " +
    "grown store, redelivery creates nothing") {
    import spark.implicits._
    val root = freshRoot(); seed(root)
    // batch 1: one typo of a stored name, one unmatchable name
    val r1 = EntityStore.ingest(spark, root, Seq(
      (101L, "Kustomer#000000010"), // 1 edit from entity 10
      (102L, "Xxstomer#000000030")) // ≥2 edits from everything
      .toDF("record_id", "name")).orderBy("record_id").collect()
    assert(r1(0).getLong(2) === 10L && !r1(0).getBoolean(3))
    assert(r1(1).getLong(2) === 102L && r1(1).getBoolean(3))
    assert(EntityStore.entities(spark, root).count() === 3)
    // batch 2: a typo of BATCH 1's new entity (only resolvable
    // because the store grew), plus an exact redelivery of record 102
    val r2 = EntityStore.ingest(spark, root, Seq(
      (201L, "XxstomerX000000030"), // 1 edit from entity 102's name
      (202L, "Xxstomer#000000030")) // exact redelivery
      .toDF("record_id", "name")).orderBy("record_id").collect()
    assert(r2(0).getLong(2) === 102L && !r2(0).getBoolean(3),
      "second-generation typo resolves via the grown store")
    assert(r2(1).getLong(2) === 102L && !r2(1).getBoolean(3),
      "redelivery matches its own entity at distance 0")
    assert(EntityStore.entities(spark, root).count() === 3,
      "matched batches grow nothing")
  }

  test("best match is min (distance, entity_id) within the block") {
    import spark.implicits._
    val root = freshRoot()
    EntityStore.init(Seq(
      (5L, "Customer#000000015"), (6L, "Customer#000000016"))
      .toDF("entity_id", "name"), root)
    // distance 1 to BOTH stored names (last-digit neighbors): the
    // tie breaks to the smaller entity id
    val r = EntityStore.ingest(spark, root, Seq(
      (900L, "Customer#00000001X")).toDF("record_id", "name"))
      .collect()(0)
    assert(r.getLong(2) === 5L && !r.getBoolean(3))
  }

  test("batch-then-merge convention: two mutually-similar records in " +
    "ONE batch found two entities") {
    import spark.implicits._
    val root = freshRoot(); seed(root)
    val r = EntityStore.ingest(spark, root, Seq(
      (301L, "Zustomer#000000050"),
      (302L, "Zustomer#000000050"))
      .toDF("record_id", "name")).orderBy("record_id").collect()
    assert(r.forall(_.getBoolean(3)), "both match only the PRE-batch store")
    assert(r.map(_.getLong(2)).toSet === Set(301L, 302L))
    assert(EntityStore.entities(spark, root).count() === 4)
  }
}
