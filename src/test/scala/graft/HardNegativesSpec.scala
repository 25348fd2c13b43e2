package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Hard-negative mining (sim12): same-label candidates are excluded no
  * matter how similar, ranking follows the 4dp-cosine + id tie-break
  * contract, and both labels ride along for the triplet builder. */
class HardNegativesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // anchor 100 (label 0) at e1; a same-label EXACT COPY (id 1, the
  // trivially-hardest candidate — must be excluded); two label-1
  // vectors at decreasing similarity; one label-2 vector orthogonal
  private val vecs = Seq(
    (100L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 1),
    (3L, Array(0.5f, 0.5f, 0.0f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("same-label candidates are excluded even at cosine 1.0; " +
    "negatives rank by similarity with labels attached") {
    val out = Similarity.hardNegatives(
        vecs, vecs.filter(col("vec_id") === 100), k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 3L, 4L),
      "rank order must be sim-desc over DIFFERENT-label rows only")
    assert(!out.map(_.getLong(2)).contains(1L),
      "the same-label exact copy must never appear")
    assert(out.forall(_.getInt(4) === 0), "anchor_label carried")
    assert(out.map(_.getInt(5)).toSeq === Seq(1, 1, 2),
      "neg_label carried per negative")
    assert(out.head.getDouble(3) > out.last.getDouble(3))
  }

  test("an anchor whose label covers the whole corpus yields no rows") {
    val mono = Seq(
      (10L, Array(1.0f, 0.0f), 7), (11L, Array(0.0f, 1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(
      mono, mono.filter(col("vec_id") === 10), k = 5).count() === 0L)
  }
}
