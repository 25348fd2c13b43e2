package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** BPE training against hand-executed merges: weighted pair counts,
  * (count DESC, l, r) tie-breaks, cascading multi-char merges, greedy
  * left-first overlap handling, and the apply side. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("textbook corpus learns the hand-computed merge sequence with " +
    "exact weighted counts") {
    // words: low x3, lower x2, newest x1
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val out = Bpe.trainMerges(docs, merges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      // l-o and o-w tie at 5; 'l' < 'o' breaks the tie
      (1L, "l", "o", "lo", 5L),
      (2L, "lo", "w", "low", 5L),
      // low-e and e-r tie at 2; 'e' < 'low' breaks the tie
      (3L, "e", "r", "er", 2L),
      (4L, "low", "er", "lower", 2L)))
  }

  test("overlapping pairs count every occurrence but merge greedily " +
    "left-first") {
    val docs = Seq("aaa").toDF("text")
    val out = Bpe.trainMerges(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "a", "a", 2L),   // 'aaa' holds TWO overlapping (a,a) pairs
      (2L, "aa", "a", 1L)), // greedy left-first left 'aa a', not 'a aa'
      "overlap counting and left-first merging must both hold")
  }

  test("applyMerges re-tokenizes words under an ordered merge list") {
    val docs = Seq("low lower").toDF("text")
    val out = Bpe.applyMerges(docs, Seq(("l", "o"), ("lo", "w")))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(out("low") === List("low"))
    assert(out("lower") === List("low", "e", "r"))
  }
}
