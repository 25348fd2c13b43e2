package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming KS gate (s17): the clean micro-batch passes, the
  * ×1.5-scaled micro-batch flags, and a full stream replay into the
  * same verdict store publishes nothing twice (content-tag dedup =
  * exactly-once verdicts from at-least-once appends). */
class StreamKsGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("clean batch quiet, drifted batch flagged, replay idempotent") {
    val q = SparkEntry.queries("s17_stream_ks_gate")
    val first = q(spark, dir).collect()
    assert(first.length === 2)
    val byTag = first.map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
    assert(byTag.keySet === Set(1L, 3L), "content-derived batch tags")
    assert(!byTag(1L)._4, "clean quarter must pass the gate")
    assert(byTag(3L)._4, "×1.5 quarter must flag")
    assert(byTag(3L)._3 > byTag(1L)._3, "planted drift dominates")
    // second full run = a complete redelivery of every micro-batch
    // into a fresh store; verdicts must be byte-identical
    val second = q(spark, dir).collect()
    assert(second.map(_.toString).sorted.toSeq ===
      first.map(_.toString).sorted.toSeq)
  }

  test("same-store full redelivery collapses to one verdict row per " +
    "batch (content-tag dedup)") {
    import java.nio.file.Files
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sdir = Files.createTempDirectory("ksgate_stream")
    val out = Files.createTempDirectory("ksgate_out").toString + "/v"
    Seq(0 -> Seq((1L, 5.0), (5L, 6.0), (9L, 7.0)),
      1 -> Seq((3L, 50.0), (7L, 60.0), (11L, 70.0))).foreach {
      case (i, rows) =>
        rows.toDF("event_id", "value").coalesce(1)
          .write.parquet(s"$sdir/f$i")
    }
    val ref = Seq(5.0, 6.0, 7.0, 8.0).toDF("value")
    def run() = graft.streaming.StreamPipeline.streamKsGate(spark,
      spark.readStream
        .schema("event_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet").parquet(sdir.toString),
      ref, binExpr = "CAST(floor(value * 10000D) AS BIGINT)",
      tagExpr = "event_id % 4", outRoot = out)
    val one = run().collect()
    assert(one.length === 2, "one verdict per micro-batch")
    // a second full replay appends byte-identical rows; the store
    // read must still present exactly one verdict per batch tag
    val two = run().collect()
    assert(two.length === 2, "redelivered verdicts collapse")
    assert(two.map(_.toString).sorted.toSeq ===
      one.map(_.toString).sorted.toSeq)
  }
}
