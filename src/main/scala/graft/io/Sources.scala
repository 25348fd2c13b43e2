package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources (SURVEY.md §2.1 S1-S3, S7-S8). */
object Sources {

  /** S1: bounded Kafka read (batch_processor.py:85-92). Config parity;
    * requires a live broker, so the offline harness substitutes JSON-lines
    * / parquet inputs through the same downstream transforms. */
  def kafkaBatch(spark: SparkSession, brokers: String,
      topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
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
