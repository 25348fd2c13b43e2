package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Retention

/** Partition retention sweep on a real temp layout. */
class RetentionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("drops exactly the expired partitions; survivors read back " +
    "byte-intact; a second sweep is a no-op") {
    val root = Files.createTempDirectory("graft_ttl").toString
    Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L))
      .toDF("id", "d")
      .write.mode("overwrite").partitionBy("d").parquet(root)
    val dropped = Retention.sweep(spark, root, "d", cutoff = 20L)
    assert(dropped === Seq(10L))
    val left = spark.read.parquet(root)
      .select("id").as[Long].collect().sorted
    assert(left.toSeq === Seq(3L, 4L))
    assert(Retention.sweep(spark, root, "d", cutoff = 20L).isEmpty)
  }

  test("a stray non-partition directory fails loudly instead of " +
    "being guessed at — and aborts BEFORE deleting anything, even " +
    "expired partitions (validate-first, round-7 advisor fix)") {
    val root = Files.createTempDirectory("graft_ttl_bad").toString
    // two expired partitions that sort BEFORE the stray dir in the
    // listing — an interleaved sweep would have dropped them
    Seq((1L, 10L), (2L, 11L), (3L, 30L)).toDF("id", "d")
      .write.mode("overwrite").partitionBy("d").parquet(root)
    Files.createDirectory(java.nio.file.Paths.get(root, "stray"))
    intercept[IllegalArgumentException] {
      Retention.sweep(spark, root, "d", cutoff = 20L)
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "d=10")) &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "d=11")),
      "an aborted sweep must leave every partition intact")
  }

  test("missing root yields an empty sweep") {
    assert(Retention.sweep(spark, "/tmp/graft_ttl_nope_xyz", "d",
      cutoff = 1L).isEmpty)
  }
}
