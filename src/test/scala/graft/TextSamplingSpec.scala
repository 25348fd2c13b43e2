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
}
