package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for file skipping, the engine-side core of `OPTIMIZE ... ZORDER BY`.
  *
  * Why: a lake sorted by one key gives perfect parquet min/max pruning
  * on that key and NONE on any other. Interleaving the bits of two (or
  * more) bucketed dimensions makes every output file cover a small
  * rectangle of the key space, so scans filtered on EITHER dimension
  * skip most files. At 100 TB this is the difference between reading
  * one user's slice (a few files) and scanning the whole table.
  *
  * The z-value is pure codegen'd bit arithmetic (shift/and/or chains —
  * no UDF, no shuffle to compute); the layout write is ONE range
  * repartition on the z-value (Spark samples the range boundaries, so
  * the curve is balanced even when the dimensions are skewed) plus an
  * in-partition sort that never crosses executors.
  *
  * Dimensions must be bucketed to small non-negative ints first
  * ([[bucketed]] gives an equi-width bucketing; rank-based bucketing
  * via ntile composes for heavily skewed dims at the cost of one extra
  * window pass over (dim) — metadata-sized when pre-aggregated).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative ints:
    * result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Equi-width bucketing of a numeric column into [0, nBuckets).
    *
    * Assumes an INTEGRAL domain: the `max - min + 1` denominator counts
    * the distinct integer values so the top value maps to the last
    * bucket without the `least` clamp doing the work. On a continuous/
    * fractional domain the +1 skews bucket widths (under-filling the
    * top bucket as the range shrinks) — divide by `(max - min)` and let
    * the clamp catch `c == max` instead if fractional dims are added. */
  def bucketed(c: Column, min: Column, max: Column,
      nBuckets: Int): Column =
    least(lit(nBuckets - 1),
      floor((c - min).cast("double") / (max - min + lit(1)) * nBuckets)
        .cast("long"))

  /** Rewrite `df` z-ordered on two bucketed dimensions: range-partition
    * on the z-value (balanced via range sampling), sort within each
    * partition, drop the helper column, write. `numFiles` stands in for
    * the size-targeted file count a real lake derives from bytes. */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
      path: String, numFiles: Int, bits: Int = 16): Unit = {
    val z = "_graft_z"
    df.withColumn(z, zValue(dimA, dimB, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }
}
