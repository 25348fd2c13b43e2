package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.agg.{Bloom, BloomFilter}
import graft.expr.BloomExprs

class BloomSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(hashes: Seq[Long], bits: Int, k: Int,
      parts: Int = 1): Array[Long] =
    hashes.toDF("h").repartition(parts).as[Long]
      .select(new BloomFilter(bits, k).toColumn.name("bf")).head()

  private val inserted = (1L to 500L).map(i => i * 0x9E3779B97F4A7C15L)
  private val absent = (10001L to 20000L).map(i => i * 0x5851F42D4C957F2DL)

  test("no false negatives, ever") {
    val bf = build(inserted, 1 << 14, 5)
    assert(inserted.forall(Bloom.mightContain(bf, _, 5)))
  }

  test("false-positive rate stays near the analytic bound") {
    val bf = build(inserted, 1 << 14, 5)
    val fp = absent.count(Bloom.mightContain(bf, _, 5))
    // (1 - e^(-kn/m))^k ≈ 5.7e-5 -> expect ~0.6 of 10k; 20 is 30x slack
    assert(fp <= 20, s"false positives: $fp of ${absent.size}")
  }

  test("merge is bitwise OR: two half-builds equal the full build") {
    val (a, b) = inserted.splitAt(250)
    val full = build(inserted, 1 << 12, 4)
    val halves = build(a, 1 << 12, 4).zip(build(b, 1 << 12, 4))
      .map { case (x, y) => x | y }
    assert(full.toSeq === halves.toSeq)
  }

  test("build is partition-order invariant") {
    assert(build(inserted, 1 << 12, 4).toSeq ===
      build(inserted, 1 << 12, 4, parts = 13).toSeq)
  }

  test("codegen'd probe expression agrees with the JVM probe") {
    val bf = build(inserted, 1 << 13, 5)
    val got = (inserted.take(100) ++ absent.take(2000)).toDF("h")
      .withColumn("pass", BloomExprs.bloomMightContain(col("h"),
        typedLit(bf), lit(5)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    got.foreach { case (h, pass) =>
      assert(pass === Bloom.mightContain(bf, h, 5))
    }
    assert(got.count(_._2) >= 100) // every inserted probe passed
  }
}
