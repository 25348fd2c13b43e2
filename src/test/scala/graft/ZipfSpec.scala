package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Zipf rank-frequency fit on a corpus with a planted power law. */
class ZipfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a corpus with freq = 12/rank fits slope −1 and intercept " +
    "ln 12") {
    // token counts 12, 6, 4, 3 at ranks 1..4 → ln f = ln 12 − ln r
    val docs = (
      Seq.fill(12)("alpha") ++ Seq.fill(6)("beta") ++
        Seq.fill(4)("gamma") ++ Seq.fill(3)("delta"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.zipfFit(docs, topK = 10).collect().head
    assert(out.getLong(0) === 4L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-3,
      s"slope ${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - math.log(12.0)) < 1e-3,
      s"intercept ${out.getDouble(2)}")
  }

  test("rank ties break lexicographically and topK caps the fit set") {
    val docs = Seq((1L, "x x x y y z w"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.zipfFit(docs, topK = 3).collect().head
    // tokens: x=3, y=2, z=1, w=1 → top3 keeps x, y, w (w < z at ties)
    assert(out.getLong(0) === 3L)
  }
}
