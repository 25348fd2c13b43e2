package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.NgramLm

/** Bigram-LM scoring on a structured reference (the synthetic harness
  * corpus is near-uniform, so discrimination is pinned here): in-
  * distribution text scores best, scrambled word order worse than
  * out-of-vocabulary junk (the add-one floor 1/V is GENEROUS to unseen
  * histories — a known smoothing artifact worth pinning). */
class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20 copies of one sentence: V = 8, c(the) = 40, every other c = 20,
  // every observed bigram count = 20
  private def ref = Seq.fill(20)(
    "the quick brown fox jumps over the lazy dog").toDF("text")

  private def docs = Seq(
    (1L, "the quick brown fox"),  // in-distribution
    (2L, "fox the brown quick"),  // same words, scrambled order
    (3L, "zz yy xx")              // fully out-of-vocabulary
  ).toDF("doc_id", "text")

  private def micro(x: Double): Long = math.round(x * 1000000)

  test("avg NLL: in-distribution < OOV junk < scrambled; bigram " +
    "counts and the hand-computed in-distribution score are exact") {
    val out = NgramLm.avgNll(ref, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 3L && out(3L)._1 === 2L)
    // doc 1: (the,quick) = 21/48, (quick,brown) = (brown,fox) = 21/28;
    // per-term micro-nat quantization, truncating mean — replayed
    // exactly in integer arithmetic
    val s = micro(-math.log(21.0 / 48)) +
      micro(-math.log(21.0 / 28)) * 2
    val expected = if (s >= 0) s / 3 else -((-s) / 3)
    assert(out(1L)._2 === expected)
    assert(out(1L)._2 < out(3L)._2,
      "reference-like text must beat OOV junk")
    assert(out(3L)._2 < out(2L)._2,
      "scrambled in-vocabulary text scores WORSE than OOV: unseen " +
        "histories get the 1/V floor while seen histories spread " +
        "their mass — the documented add-one artifact")
  }

  test("single-token and empty docs are excluded (no bigrams to score)") {
    val out = NgramLm.avgNll(ref,
      Seq((1L, "the"), (2L, ""), (3L, "the quick")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(3L))
  }
}
