package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.util.ArrayData

/** Mergeable Bloom filter (Bloom 1970): `numBits` bits, `k` probes per
  * item. mightContain is NEVER wrong about inserted items (no false
  * negatives); false-positive rate ≈ (1 − e^(−kn/m))^k.
  *
  * Why it matters at 100 TB: a semi-join against a billion-key build
  * side shuffles the probe side on the key; a Bloom built with one
  * partial-aggregate pass is a FIXED m-bit array that broadcasts to
  * every scan task and prunes non-matching rows before any exchange —
  * the library-level form of Spark's own runtime bloom pruning
  * (InjectRuntimeFilter, pinned by PlanShapeSpec), usable where the
  * optimizer's version can't reach: cross-job pruning (build once,
  * persist, probe in later jobs) and probe sides the rewrite rules
  * skip. The state merges by bitwise OR (commutative, idempotent), so
  * map-side combine works on any partitioning.
  *
  * Input is the item's 64-bit hash (produce it with `xxhash64(col)` so
  * hashing stays codegen'd on the scan side). Probe-specific bit
  * indexes come from a SplitMix64 finalizer over (itemHash XOR
  * probe-salt) — pure integer math, deterministic on any cluster
  * layout, the CountMin convention. */
class BloomFilter(numBits: Int, numHashes: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16]: $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], itemHash: Long): Array[Long] = {
    Bloom.set(buf, itemHash, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = CountMin.arrayEnc
  override def outputEncoder: Encoder[Array[Long]] = CountMin.arrayEnc
}

object Bloom {

  /** SplitMix64 finalizer over (hash, probe) — same full-avalanche mix
    * as [[CountMin.index]], modulo the bit count. */
  def bitIndex(itemHash: Long, probe: Int, numBits: Int): Int = {
    var z = itemHash ^ (0x9E3779B97F4A7C15L * (probe + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, numBits.toLong).toInt
  }

  def set(words: Array[Long], itemHash: Long, k: Int): Unit = {
    val numBits = words.length * 64
    var i = 0
    while (i < k) {
      val b = bitIndex(itemHash, i, numBits)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], itemHash: Long, k: Int)
      : Boolean = {
    val numBits = words.length * 64
    var i = 0
    while (i < k) {
      val b = bitIndex(itemHash, i, numBits)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe entry point for the codegen'd expression — takes the words
    * as Tungsten ArrayData so the generated code never copies the
    * filter per row. */
  def mightContainData(words: ArrayData, itemHash: Long, k: Int)
      : Boolean = {
    val numBits = words.numElements() * 64
    var i = 0
    while (i < k) {
      val b = bitIndex(itemHash, i, numBits)
      if ((words.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Number of set bits — the fill-ratio input of the fp-rate check. */
  def popCount(words: Array[Long]): Long =
    words.map(java.lang.Long.bitCount(_).toLong).sum
}
