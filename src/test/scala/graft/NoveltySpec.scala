package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** N-gram novelty (t37): hand-computed df=1 shares on a planted
  * corpus, short docs excluded, within-doc repeats counted once, and
  * the boilerplate-detection property the operator exists for — a
  * shared template drags novelty down without any near-dup pair. */
class NoveltySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-computed shares; short docs excluded; repeats distinct") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),       // grams: "a b c"(df2), "b c d"(df1)
      (2L, "a b c x"),       // grams: "a b c"(df2), "b c x"(df1)
      (3L, "z z z z"),       // gram "z z z" repeats → ONE distinct, df1
      (4L, "too short"))     // < 3 tokens → excluded
      .toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val byId = out.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) === ((2L, 1L, 500000L)))
    assert(byId(2L) === ((2L, 1L, 500000L)))
    assert(byId(3L) === ((1L, 1L, 1000000L)), "repeat grams count once")
  }

  test("a shared template drags novelty toward zero with no pairwise " +
    "near-dup anywhere") {
    import spark.implicits._
    val template = "subscribe to our newsletter for weekly updates today"
    val docs = (1L to 6L).map(i =>
      (i, s"$template unique$i tail$i body$i")).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs).collect()
    // template grams have df=6; only the grams touching uniqueN are
    // novel — every doc's novelty is the same and well below 1
    assert(out.forall(_.getLong(3) < 500000L),
      "template mass dominates every doc")
    assert(out.forall(_.getLong(2) > 0L), "unique tails stay novel")
  }
}
