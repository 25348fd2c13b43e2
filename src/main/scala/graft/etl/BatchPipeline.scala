package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Sinks

/** The batch lifecycle entry (SURVEY.md §3.1): wire records →
  * Bronze → Silver → Gold, each layer materialized as hive-partitioned
  * parquet and re-read for the next stage (the medallion's
  * replay-by-design contract, README.md:214-219 of the reference).
  *
  * Differences from the reference's `batch_processor.main`:
  *  - counts come from the RE-READ layer (metadata-only over the written
  *    files), not a second execution of the full plan — the reference's
  *    `write` + `count()` runs every pipeline twice
  *    (batch_processor.py:125-131, SURVEY.md §3.1);
  *  - source-agnostic: takes a wire DataFrame, so Kafka, JSON-lines and
  *    test fixtures all flow through the identical code.
  */
object BatchPipeline {

  final case class LayerCounts(bronze: Long, silver: Long, gold: Long)

  def run(spark: SparkSession, wire: DataFrame, outRoot: String)
      : LayerCounts = {
    Sinks.writePartitioned(Bronze.fromWire(wire), s"$outRoot/bronze")
    val bronze = spark.read.parquet(s"$outRoot/bronze")
    Sinks.writePartitioned(Silver.fromBronze(bronze), s"$outRoot/silver")
    val silver = spark.read.parquet(s"$outRoot/silver")
    Sinks.writePartitioned(Gold.fromSilver(silver), s"$outRoot/gold")
    val gold = spark.read.parquet(s"$outRoot/gold")
    LayerCounts(bronze.count(), silver.count(), gold.count())
  }

  /** Fused variant for benchmarks (SURVEY.md §4 pipelining row): one
    * plan bronze→gold with no intermediate materialization. */
  def fusedBronzeToGold(wire: DataFrame,
      strictCategory: Boolean = false,
      deterministicArrays: Boolean = false): DataFrame =
    Gold.fromSilver(Silver.fromBronze(Bronze.fromWire(wire)),
      strictCategory, deterministicArrays)
}
