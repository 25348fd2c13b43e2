package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Autocorrelation
import graft.text.DomainShift

/** ACF on planted periodic series; source-KL on planted vocabulary
  * divergence. */
class AcfDomainShiftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L

  test("a strictly period-4 series has acf ≈ 1 at lag 4 and troughs " +
    "at half-period") {
    // counts cycle 5,1,5,1,... over 64 hours: one event-row per count
    val rows = (0 until 64).flatMap { h =>
      val c = if (h % 4 < 2) 5 else 1
      (0 until c).map(_ => h * H + 7L)
    }
    val acf = Autocorrelation.hourlyAcf(rows.toDF("us"), maxLag = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(acf(4) > 0.9, s"period-4 peak missing: ${acf(4)}")
    assert(acf(8) > 0.85)
    assert(acf(2) < -0.9, s"half-period trough missing: ${acf(2)}")
    assert(acf.size === 8)
  }

  test("gap hours enter the series as zeros (spine fill)") {
    // events only at hours 0 and 4; hours 1-3 must exist as zeros:
    // with the gaps filled, mean is far below the two spikes and
    // lag-4 alignment of the spikes makes acf(4) positive
    val rows = Seq(0L * H, 0L * H + 1, 4L * H, 4L * H + 1, 8L * H,
      8L * H + 1)
    val acf = Autocorrelation.hourlyAcf(rows.toDF("us"), maxLag = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(acf(4) > 0)
    assert(acf(1) < 0)
  }

  test("source KL: a divergent source scores higher than one matching " +
    "the corpus blend") {
    val docs = (
      (0 until 40).map(i => (i.toLong, "alpha beta gamma delta", "mix"))
        ++ (0 until 40).map(i =>
          (100L + i, "alpha beta gamma delta", "same"))
        ++ (0 until 4).map(i => (200L + i, "zzz qqq zzz qqq", "weird")))
      .toDF("doc_id", "text", "source")
    val out = DomainShift.sourceKl(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("weird") > out("same"))
    assert(out("weird") > 1.0) // ln(n/c_t) mass is large for rare tokens
    // 'same' speaks the majority language: KL near zero
    assert(out("same") < 0.2)
  }

  test("source KL is always finite and vocab counts are per-source") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a a a", "s2"))
      .toDF("doc_id", "text", "source")
    val out = DomainShift.sourceKl(docs).collect()
    assert(out.forall(r => !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinite))
    val vocab = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vocab === Map("s1" -> 3L, "s2" -> 1L))
  }
}
