package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Sinks, Sources}
import graft.streaming.StreamPipeline

/** Config-assembly pins for the wiring the sandbox can't exercise live
  * (no Kafka broker, no object store): the EXACT option maps the S1/S2
  * Kafka readers and the S6 S3A configuration emit, matched key-for-key
  * against the reference (`batch_processor.py:57-62,85-92`,
  * `stream_processor.py:244-251`). A drift in any key/value — the thing
  * a user would hit on day one against a real broker — fails here
  * instead of only in production. */
class SourcesConfigSpec extends AnyFunSuite {

  test("S1 batch Kafka reader options match batch_processor.py:85-92") {
    assert(Sources.kafkaBatchOptions("kafka:9092", "air-quality") === Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "subscribe" -> "air-quality",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
  }

  test("S2 streaming Kafka reader options match " +
    "stream_processor.py:244-251 (no ending offset — unbounded; " +
    "failOnDataLoss=false for broker-side retention races)") {
    val o = StreamPipeline.kafkaSourceOptions("kafka:9092", "air-quality")
    assert(o === Map(
      "kafka.bootstrap.servers" -> "kafka:9092",
      "subscribe" -> "air-quality",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false"))
    assert(!o.contains("endingOffsets"),
      "a streaming read must stay unbounded")
  }

  test("S6 S3A options match batch_processor.py:57-62 and land on the " +
    "live hadoopConfiguration") {
    assert(Sinks.s3aOptions("http://minio:9000", "ak", "sk") === Map(
      "fs.s3a.endpoint" -> "http://minio:9000",
      "fs.s3a.access.key" -> "ak",
      "fs.s3a.secret.key" -> "sk",
      "fs.s3a.path.style.access" -> "true",
      "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
      "fs.s3a.connection.ssl.enabled" -> "false"))
    val spark = TestSpark.spark
    Sinks.configureS3a(spark, "http://minio:9000", "ak", "sk")
    val conf = spark.sparkContext.hadoopConfiguration
    Sinks.s3aOptions("http://minio:9000", "ak", "sk").foreach {
      case (k, v) => assert(conf.get(k) === v, k)
    }
  }
}
