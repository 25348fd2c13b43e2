package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sources & sinks (SURVEY.md §2.1): partitioned parquet (S4), CSV export
  * (S9), S3A wiring (S6). The medallion writes are hive-partitioned by
  * year/month/day — at 100 TB this is what makes downstream partition
  * pruning (filter on year=…) skip data at the file-listing level. */
object Sinks {

  /** S4: `mode(Overwrite).partitionBy(year,month,day).parquet(path)`
    * (batch_processor.py:125-129). Repartitions by the partition keys
    * first: without it every task writes a file into every partition dir
    * (tasks × partitions small files — the classic at-scale
    * anti-pattern); with it each hive partition is written by the task(s)
    * owning that key. AQE coalescing keeps per-task output reasonable. */
  def writePartitioned(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(col("year"), col("month"), col("day"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month", "day")
      .parquet(path)
  }

  /** S9: CSV export with header (clickhouse_queries.sql:167-183 analog). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** The exact Hadoop keys S6 sets (batch_processor.py:57-62) — a pure
    * map so SourcesConfigSpec pins the contract without an object
    * store to connect to. */
  def s3aOptions(endpoint: String, accessKey: String, secretKey: String,
      pathStyle: Boolean = true): Map[String, String] = Map(
    "fs.s3a.endpoint" -> endpoint,
    "fs.s3a.access.key" -> accessKey,
    "fs.s3a.secret.key" -> secretKey,
    "fs.s3a.path.style.access" -> pathStyle.toString,
    "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "fs.s3a.connection.ssl.enabled" -> "false")

  /** S6: object-store (S3A) wiring — same Hadoop keys as
    * batch_processor.py:57-62; inert unless an endpoint is configured. */
  def configureS3a(spark: SparkSession, endpoint: String, accessKey: String,
      secretKey: String, pathStyle: Boolean = true): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    s3aOptions(endpoint, accessKey, secretKey, pathStyle)
      .foreach { case (k, v) => conf.set(k, v) }
  }
}
