package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{BatchPipeline, EventsAdapter}

class BatchPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("end-to-end batch run materializes three partitioned layers with " +
    "consistent counts; fused plan matches the materialized gold") {
    val wire = EventsAdapter.wire(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val out = Files.createTempDirectory("graft_batch").toString
    val counts = BatchPipeline.run(spark, wire, out)
    assert(counts.bronze === 1000)
    assert(counts.silver === counts.bronze) // no invalid rows in testdata
    assert(counts.gold > 0 && counts.gold <= counts.silver)
    // hive partitioning materialized
    val bronzeDirs = new java.io.File(s"$out/bronze").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(bronzeDirs.exists(_.startsWith("year=")))
    // fused plan row-count parity
    val fused = BatchPipeline.fusedBronzeToGold(wire)
    assert(fused.count() === counts.gold)
  }
}
