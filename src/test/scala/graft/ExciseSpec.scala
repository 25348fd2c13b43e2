package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Exact-substring excision (d16): duplicated k-token windows are cut
  * everywhere except their canonical (min doc_id, pos) occurrence. */
class ExciseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val span = "a b c d e f g h" // one exact 8-token window

  test("keep-one semantics: canonical doc intact, later copies cut, " +
    "full copy collapses to empty") {
    val docs = Seq(
      (1L, s"$span tail1 tail2 tail3 tail4 tail5 tail6 tail7"),
      (2L, s"front1 front2 front3 front4 front5 front6 front7 $span"),
      (3L, "unique1 unique2 unique3 unique4 unique5 unique6 " +
        "unique7 unique8"),
      (4L, s"$span tail1 tail2 tail3 tail4 tail5 tail6 tail7")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is canonical for every window it shares with doc 4 — the
    // FULL duplicate — so doc 1 survives whole and doc 4 empties
    assert(out(1L) === (15L, 0L,
      s"$span tail1 tail2 tail3 tail4 tail5 tail6 tail7"))
    assert(out(4L) === (15L, 15L, ""))
    // doc 2 shares only the 8-token span (canonical lives in doc 1)
    assert(out(2L) === (15L, 8L,
      "front1 front2 front3 front4 front5 front6 front7"))
    // unique doc untouched
    assert(out(3L) === (8L, 0L, out(3L)._3))
    assert(out(3L)._3.startsWith("unique1"))
  }

  test("overlapping removable windows merge into one maximal span; " +
    "short docs pass through") {
    val docs = Seq(
      // canonical source of a 9-token run => two overlapping 8-windows
      (1L, "a b c d e f g h i pad1 pad2 pad3 pad4 pad5 pad6 pad7"),
      // copy of the 9-token run framed by unique words: one merged
      // 9-token cut, frame kept
      (2L, "left1 a b c d e f g h i right1"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(2L) === (11L, 9L, "left1 right1"),
      "the two overlapping windows must excise as ONE 9-token span")
    assert(out(1L)._2 === 0L, "canonical run stays")
    assert(out(3L) === (2L, 0L, "tiny doc"),
      "sub-k docs contribute no windows and pass through")
  }
}
