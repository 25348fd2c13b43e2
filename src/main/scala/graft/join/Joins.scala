package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, each expressed as a
  * composition of shuffle-friendly primitives (SURVEY.md §2.3 extension;
  * the reference's join surface is plain equi-joins, e.g.
  * `ml_training/prepare_data.py` merges — these add the time-series and
  * skew-control variants a 100 TB training-data pipeline needs).
  *
  * Scale notes:
  *  - [[asOfBackward]] is ONE shuffle (union, then a window partitioned by
  *    the join keys). The naive alternative — inequality join + per-row
  *    argmax — shuffles twice and explodes to O(|L|·|R| per key) rows
  *    before pruning; at 1000 executors the union+window form is the only
  *    one that survives. The running `last(..., ignoreNulls)` frame is
  *    incremental state, O(1) per row, inside a single WindowExec.
  *  - [[rangeJoinBroadcast]] keeps the band table on the driver →
  *    BroadcastNestedLoopJoin; correct whenever the right side is small
  *    (band/config tables). Never use for two large sides — bucketize to
  *    an equi-join instead.
  *  - [[saltedEquiJoin]] is the explicit-control counterpart of AQE's
  *    skew-join split: the big side's hot keys are spread over `salts`
  *    sub-partitions by a deterministic hash of a unique column, and the
  *    small side is replicated `salts`×. Result is bit-identical to the
  *    plain join (oracle-checked by `xj3_salted_join`).
  */
object Joins {

  /** Backward as-of join: for every left row, attach the single latest
    * right row with `right.ts <= left.ts` within the same key group
    * (DuckDB/pandas `ASOF JOIN` semantics, match inclusive on equal ts).
    *
    * Left rows with no prior right row get a null match struct. Payload
    * fields are wrapped in a per-row struct before the running
    * `last(ignoreNulls)` so right rows whose payload field is null are
    * still legitimate matches. Among right rows sharing an identical
    * (key, ts) the winner is unspecified — same as DuckDB ASOF.
    *
    * @param payload right-side columns to carry; emitted as `asof_<name>`
    * @param toleranceMicros max lookback in µs: a match older than
    *   `left.ts − tolerance` is discarded (payload nulled, left row kept)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(keys.contains)
    // Unified shape: keys ++ leftExtra (null on right rows) ++ __match
    // candidate struct (null on left rows; carries the right ts for the
    // tolerance test) + the ordering pair.
    val candFields = ("__rts" -> right.schema(rightTs).dataType) +:
      payload.map(p => p -> right.schema(p).dataType)
    val lSide = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__cand",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          candFields.map { case (n, t) =>
            org.apache.spark.sql.types.StructField(n, t, nullable = true) })))
    val rSide = {
      val base = right.select(
        keys.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(col(rightTs).as("__rts") +: payload.map(col): _*)
            .as("__cand")): _*)
      leftExtra.foldLeft(base)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide
      .unionByName(rSide.select(lSide.columns.map(col): _*))
      .withColumn("__match", last(col("__cand"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inWindow = toleranceMicros match {
      case Some(tol) =>
        unix_micros(col("__ts")) - unix_micros(col("__match")("__rts")) <=
          lit(tol)
      case None => lit(true)
    }
    matched.select(
      (keys ++ leftExtra).map(col) ++
        payload.map(p =>
          when(inWindow, col("__match")(p)).as(s"asof_$p")): _*)
  }

  /** Interval containment join: `fact.valueCol ∈ [bands.lo, bands.hi)`.
    * The band table is broadcast (must be small). */
  def rangeJoinBroadcast(fact: DataFrame, bands: DataFrame,
      valueCol: String, lo: String, hi: String): DataFrame =
    fact.join(broadcast(bands),
      col(valueCol) >= col(lo) && col(valueCol) < col(hi))

  /** Skew-proof equi-join of a big (possibly hot-keyed) fact against a
    * small-ish dimension, with explicit salting: fact keys spread over
    * `salts` sub-keys via a hash of `saltBy` (any unique/near-unique fact
    * column — determinism keeps the oracle reproducible), dimension
    * replicated `salts`×. Equivalent to `fact.join(dim, fact(k)===dim(k))`.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBy: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(salts.toLong)))
    val repDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(repDim,
        saltedFact(factKey) === repDim(dimKey) &&
          saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
