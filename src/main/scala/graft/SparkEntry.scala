package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query groups live under [[graft.queries]]; each exposes a `queries` map
  * (Spark implementations) and an `oracle` map (DuckDB ANSI-SQL twins run
  * by the driver's correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The A1 Gold hourly roll-up — the reference's flagship aggregate
    * (batch_processor.py:191-218). */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.gold(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++ AnalyticsQueries.queries ++
      FeatureQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ StreamingQueries.queries ++
      SinkQueries.queries ++ ExtendedQueries.queries ++
      JoinQueries.queries ++ DecisionSupportQueries.queries

  /** Bench-scoped workload substitutions: same composition, explicitly
    * smaller planted corpus, so graft.Bench times an operator's steady
    * shape instead of repeatedly rebuilding its fixture. Verify NEVER
    * reads this map — the oracle always certifies the full-scale entry
    * — and Bench records every substituted name in BENCH_FULL.json
    * ("bench_overrides") so the artifact carries the workload delta
    * (round-10 ADVICE: no JVM-global flag keying query semantics). */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.benchOverrides ++ TextQueries.benchOverrides ++
      StreamingQueries.benchOverrides ++ GraphExtQueries.benchOverrides

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    PipelineQueries.oracle ++ AnalyticsQueries.oracle ++
      FeatureQueries.oracle ++ RelationalQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ StreamingQueries.oracle ++
      SinkQueries.oracle ++ ExtendedQueries.oracle ++
      JoinQueries.oracle ++ DecisionSupportQueries.oracle
}
