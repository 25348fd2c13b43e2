package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Stable content-hash sampling: determinism, rate calibration,
  * dedup-alignment (identical texts land on the same side of the cut). */
class TextSamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (0 until 2000)
    .map(i => (i.toLong, s"document number $i with some filler text"))
    .toDF("doc_id", "text")

  test("sample rate lands near the requested fraction and is " +
    "deterministic across invocations") {
    val n1 = TextAnalysis.stableSample(corpus, "text", 0.3).count()
    val n2 = TextAnalysis.stableSample(corpus, "text", 0.3).count()
    assert(n1 === n2)
    assert(n1 > 2000 * 0.25 && n1 < 2000 * 0.35, s"rate off: $n1/2000")
  }

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    assert(TextAnalysis.stableSample(corpus, "text", 0.0).count() === 0L)
    assert(TextAnalysis.stableSample(corpus, "text", 1.0).count() === 2000L)
  }

  test("duplicate texts are sampled together (dedup-aligned)") {
    val dupes = corpus.withColumn("doc_id", col("doc_id") + 10000)
    val both = corpus.unionAll(dupes)
    val kept = TextAnalysis.stableSample(both, "text", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    // every kept original has its shifted twin kept, and vice versa
    assert(kept.map(id => if (id >= 10000) id - 10000 else id + 10000)
      .forall(kept.contains))
  }

  // skewed strata: a=1200, b=600, c=200, d=100 docs
  private def mixCorpus = (0 until 2100).map { i =>
    val stratum =
      if (i < 1200) "a" else if (i < 1800) "b" else if (i < 2000) "c"
      else "d"
    (i.toLong, stratum, s"mixture doc $i padding words")
  }.toDF("doc_id", "stratum", "text")

  test("target mixture: binding stratum keeps 100%, unlisted strata " +
    "drop, achieved proportions track the target") {
    // targets a:b:c = 6:3:2 → n/w: a 200, b 200, c 100 → binding c
    // (keeps all 200); a,b down-sample toward 600/300; d unlisted
    val kept = TextAnalysis.targetMixtureSample(mixCorpus, "stratum",
      "text", Map("a" -> 6, "b" -> 3, "c" -> 2))
      .groupBy($"stratum").count()
      .as[(String, Long)].collect().toMap
    assert(!kept.contains("d"))
    assert(kept("c") === 200L)
    // 16-bit hash granularity on a few hundred docs: allow ~15% slack
    assert(math.abs(kept("a") - 600L) < 90, s"a: ${kept("a")}")
    assert(math.abs(kept("b") - 300L) < 45, s"b: ${kept("b")}")
  }

  test("target mixture is scale-invariant in the weights and " +
    "partition-invariant") {
    def ids(w: Map[String, Int], parts: Int) =
      TextAnalysis.targetMixtureSample(
        mixCorpus.repartition(parts), "stratum", "text", w)
        .select($"doc_id").as[Long].collect().toSet
    val base = ids(Map("a" -> 6, "b" -> 3, "c" -> 2), 4)
    // doubling every weight must not move a single document: the
    // acceptance test is a ratio of exact integers
    assert(ids(Map("a" -> 12, "b" -> 6, "c" -> 4), 4) === base)
    assert(ids(Map("a" -> 6, "b" -> 3, "c" -> 2), 11) === base)
  }
}
