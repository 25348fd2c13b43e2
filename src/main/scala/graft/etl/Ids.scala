package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed contiguous id assignment — the `zipWithIndex` of the
  * DataFrame world, without the single-partition sort that
  * `row_number() OVER (ORDER BY …)` plans (every row through one task —
  * the anti-scale pattern; Spark even warns `WindowExec: No Partition
  * Defined`).
  *
  * Two-phase shape:
  *  1. range-repartition by the ordering key (a sampled-boundary
  *     shuffle — the same machinery as a global sort, but partitions
  *     stay parallel);
  *  2. per-partition ranks from a window PARTITIONED by
  *     `spark_partition_id()` (runs in parallel, no cross-partition
  *     data movement) + per-partition row counts aggregated to
  *     cumulative offsets (a partition-count-sized table — broadcast
  *     joined back).
  *
  * id = partition offset + intra-partition rank. Deterministic for a
  * unique ordering key regardless of where the range boundaries land:
  * boundaries only decide WHERE the split happens, not the global
  * order. At 100 TB this is the standard way to number a corpus
  * (assigning doc ids after dedup, building contiguous vector ids for
  * ANN indexes) — the only global object is the offsets table, one row
  * per partition. */
object Ids {

  /** Distributed keyed cumulative sum: running total of `valueCol` per
    * `keyCol` in `orderCol` order — the same two-phase offsets shape as
    * [[withOrderedIds]], generalized to keyed prefix sums.
    *
    * A plain `sum().over(Window.partitionBy(key).orderBy(ord))` funnels
    * each key through ONE task — with low-cardinality keys (languages,
    * sources) that is a handful of tasks doing all the work. Here the
    * data range-partitions on (key, ord) — each key's rows are
    * contiguous and ordered ACROSS partitions, large keys span many
    * partitions — the running sum within each (key, partition) slice is
    * a parallel window, and per-slice totals (|keys|·|partitions| rows,
    * metadata-sized) roll into broadcast offsets. */
  def keyedCumsum(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, outName: String = "cumsum",
      partitions: Int = 0): DataFrame = {
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint PINS the range partitioning: the frame is
    // consumed by BOTH the local-window leg and the offsets leg, and
    // repartitionByRange boundaries are SAMPLED — if the exchange is
    // not reused between the two consumers (AQE re-planning, differing
    // column pruning), each leg can see a slightly different
    // partitioning and the offsets silently misalign (observed: x53's
    // ranks went non-contiguous). One materialization of the
    // (key, ord, value) projection is the price of a consistent
    // snapshot — the same twice-consumed-frame discipline as the graph
    // iteratives.
    val ranged = df.repartitionByRange(parts,
        (keyCol +: orderCols).map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = Window.partitionBy(col(keyCol), col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal = ranged.withColumn("__local",
      sum(col(valueCol)).over(local))
    val offsets = ranged.groupBy(col(keyCol), col("__pid"))
      .agg(sum(col(valueCol)).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(
          Window.partitionBy(col(keyCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__pid"), col("__offset"))
    withLocal
      .join(broadcast(offsets), Seq(keyCol, "__pid"))
      .withColumn(outName, col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset")
  }

  def withOrderedIds(df: DataFrame, orderCol: String,
      idName: String = "assigned_id", partitions: Int = 0): DataFrame = {
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins the sampled range boundaries across the two
    // consumers (ranked leg + counts leg) — see keyedCumsum above.
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // rank within each range partition — parallel window, bounded state
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val ranked = ranged.withColumn("__rank", row_number().over(w))
    // per-partition counts → exclusive cumulative offsets (partition-
    // count-sized; the window below runs over |parts| rows, not data)
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
    val offsets = counts
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    ranked
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(idName, col("__offset") + col("__rank"))
      .drop("__pid", "__rank", "__offset")
  }

  /** Exact NTILE(k) from a contiguous 1-based rank column — the
    * arithmetic twin of `ntile(k) OVER (ORDER BY …)` without the
    * single-partition WindowExec that a global ntile window plans:
    * q = n div k rows per bucket, the first n % k buckets take q+1,
    * and the bucket of a rank is pure integer arithmetic against the
    * broadcast 1-row count. Pair with [[withOrderedIds]] for the
    * rank. */
  def exactNtile(df: DataFrame, rnkCol: String, buckets: Int,
      outName: String): DataFrame =
    exactNtileByCount(
      df.crossJoin(broadcast(df.agg(count(lit(1)).as("__n")))),
      rnkCol, "__n", buckets, outName)
      .drop("__n")

  /** [[exactNtile]] against an EXISTING count column — the keyed form:
    * the caller joins per-key counts (broadcast, key-cardinality-sized)
    * and NTILE-within-key is the same boundary arithmetic. */
  def exactNtileByCount(df: DataFrame, rnkCol: String, nCol: String,
      buckets: Int, outName: String): DataFrame =
    df.withColumn(outName, expr(
      s"""CASE WHEN $rnkCol <= ($nCol % $buckets) * ($nCol div $buckets + 1)
          THEN ($rnkCol - 1) div ($nCol div $buckets + 1) + 1
          ELSE ($nCol % $buckets) +
            ($rnkCol - ($nCol % $buckets) * ($nCol div $buckets + 1) - 1)
              div ($nCol div $buckets) + 1 END""").cast("int"))

  /** Fixed-width zero-padded rank-key leg that FAILS LOUDLY instead of
    * silently mis-ordering: the lexicographic-equals-numeric trick
    * behind every `withOrderedIds` sort key assumes a non-negative
    * integral rendering that fits `width` digits — `lpad` silently
    * TRUNCATES overlong strings and a '-' sign breaks the order. Any
    * future caller feeding negative/string ids hits a runtime
    * raise_error naming the offending value, not a wrong rank-pick. */
  def fixedWidthKey(c: Column, width: Int): Column =
    when(c.cast("string").rlike(s"^\\d{1,$width}$$"),
      lpad(c.cast("string"), width, "0"))
      .otherwise(raise_error(concat(
        lit(s"fixed-width rank key: need a non-negative integer with" +
          s" <= $width digits, got "), c.cast("string"))))
}
