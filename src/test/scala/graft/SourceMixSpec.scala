package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.SourceMix

/** Temperature mixing on planted source skew. */
class SourceMixSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (s, n) =>
      (1 to n).map(i => (s"$s-$i", s)) }
      .toDF("doc_id", "source")

  test("alpha < 1 up-weights low-resource sources: the weight ratio " +
    "compresses relative to the count ratio, and budgets follow") {
    val out = SourceMix.temperatureMix(
      corpus(Map("big" -> 1000, "small" -> 10)),
      alpha = 0.5, budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val (nb, wb, tb) = out("big")
    val (ns, ws, ts) = out("small")
    assert(nb === 1000L && ns === 10L)
    // natural ratio 100:1; at alpha = 0.5 it must compress to ~10:1
    val wRatio = wb.toDouble / ws
    assert(wRatio > 8 && wRatio < 12,
      s"sqrt temperature must compress 100:1 to ~10:1, got $wRatio")
    assert(tb + ts <= 1000L, "truncating budgets never overshoot")
    assert(ts >= 80L, s"small source must get ~1/11 of budget: $ts")
  }

  test("outputs replay exactly from the scalar definition (quantize " +
    "n^alpha to micro ints, then pure integer arithmetic)") {
    val counts = Map("a" -> 7, "b" -> 123, "c" -> 4096)
    val out = SourceMix.temperatureMix(corpus(counts),
      alpha = 0.7, budget = 500L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val micro = counts.map { case (s, n) =>
      s -> BigInt(math.round(math.exp(0.7 * math.log(n)) * 1000000)) }
    val denom = micro.values.sum
    counts.keys.foreach { s =>
      val (sm, ppm, tgt) = out(s)
      assert(BigInt(sm) === micro(s))
      assert(BigInt(ppm) === micro(s) * 1000000 / denom)
      assert(BigInt(tgt) === micro(s) * 500 / denom)
    }
  }

  test("alpha = 0 degenerates to uniform weights over sources") {
    val out = SourceMix.temperatureMix(
      corpus(Map("a" -> 5, "b" -> 500)), alpha = 0.0, budget = 100L)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).distinct.length === 1, "equal ppm weights")
    assert(out.map(_._2).distinct.length === 1, "equal budgets")
  }
}
