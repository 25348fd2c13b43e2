package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources (SURVEY.md §2.1 S1-S3, S7-S8). */
object Sources {

  /** The exact reader options S1 wires (batch_processor.py:85-92) —
    * exposed as a pure map so SourcesConfigSpec can pin the contract
    * even though the sandbox has no broker to .load() against. */
  def kafkaBatchOptions(brokers: String,
      topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "subscribe" -> topic,
    "startingOffsets" -> "earliest",
    "endingOffsets" -> "latest")

  /** S1: bounded Kafka read (batch_processor.py:85-92). Config parity;
    * requires a live broker, so the offline harness substitutes JSON-lines
    * / parquet inputs through the same downstream transforms. */
  def kafkaBatch(spark: SparkSession, brokers: String,
      topic: String): DataFrame =
    spark.read
      .format("kafka")
      .options(kafkaBatchOptions(brokers, topic))
      .load()

  /** S3: hive-partitioned parquet scan — partition columns recovered from
    * the directory layout; Catalyst prunes partitions from filters. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S8 collapse (SURVEY.md §3.3): the reference ships parquet to
    * ClickHouse to get a SQL surface; here the SQL surface IS Spark SQL —
    * register the layers as temp views and query them. */
  def registerLayers(spark: SparkSession,
      layers: Map[String, DataFrame]): Unit =
    layers.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
