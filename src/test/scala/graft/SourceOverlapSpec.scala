package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Cross-source overlap matrix (t38): hand-computed shared counts,
  * zero pairs REPORTED (not missing), canonical pair orientation,
  * and within-source duplication not inflating the cross counts. */
class SourceOverlapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-computed matrix with a zero pair and repeated grams") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x y z w"),        // grams: "x y z", "y z w"
      ("A", "x y z w"),        // exact dup doc — must not inflate
      ("B", "x y z q"),        // grams: "x y z", "y z q"
      ("C", "aa bb cc dd"))    // grams: disjoint from A and B
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")),
      "full canonical matrix, zeros included")
    assert(out(("A", "B")) === ((2L, 2L, 1L, 500000L)),
      "one shared gram of two; dup doc counted once")
    assert(out(("A", "C")) === ((2L, 2L, 0L, 0L)), "zero reported")
    assert(out(("B", "C")) === ((2L, 2L, 0L, 0L)))
  }
}
