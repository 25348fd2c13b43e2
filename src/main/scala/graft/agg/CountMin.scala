package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable count-min sketch (Cormode & Muthukrishnan 2005): `d` hash
  * rows × `w` counters. estimate(x) = min over rows of the counter x
  * hashes into — always ≥ the true count, and over by more than
  * (e/w)·N with probability only e^(−d).
  *
  * Why it matters at 100 TB: exact per-item counts of a high-cardinality
  * column (URLs, n-grams, user ids) shuffle |distinct| rows; the sketch
  * is a FIXED d·w Long array per group that combines map-side and
  * merges by element-wise add — the same partial/final shape as any
  * algebraic aggregate, with constant state. The pattern behind heavy-
  * hitter detection and frequency capping in corpus curation.
  *
  * Input is the item's 64-bit hash (produce it with `xxhash64(col)` so
  * hashing stays codegen'd on the scan side). Row-specific indexes come
  * from a SplitMix64 finalizer over (itemHash XOR row-salt) — pure
  * integer math, deterministic on any cluster layout, no RNG state.
  */
class CountMin(d: Int, w: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(d >= 1 && d <= 16, s"d must be in [1,16]: $d")
  require(w >= 2, s"w must be >= 2: $w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], itemHash: Long): Array[Long] = {
    var r = 0
    while (r < d) {
      buf(r * w + CountMin.index(itemHash, r, w)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = CountMin.arrayEnc
  override def outputEncoder: Encoder[Array[Long]] = CountMin.arrayEnc
}

object CountMin {

  private[agg] val arrayEnc: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** SplitMix64 finalizer — full-avalanche mix of the item hash with a
    * per-row salt; the d derived hashes behave independently. */
  private[agg] def index(itemHash: Long, row: Int, w: Int): Int = {
    var z = itemHash ^ (0x9E3779B97F4A7C15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    // floorMod keeps the index non-negative for negative mixed values
    java.lang.Math.floorMod(z, w.toLong).toInt
  }

  /** Point estimate from a finished sketch: min over the d counters the
    * item hashes into. */
  def estimate(sketch: Array[Long], itemHash: Long, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + index(itemHash, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
