package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Equivalence pin for the r14 single-pass BM25 (per-row array math,
  * no corpus-token explode): the optimized operator must produce the
  * EXACT rows of the spec-shaped exploded form — same doubles, same
  * tie-breaks — on a fixture that exercises every edge the rewrite
  * touched (multi-occurrence terms, docs matching a strict subset of
  * the query, non-matching docs, an empty-string doc, a NULL-text doc,
  * repeated whitespace). t17/rrf1's oracle rows check the same thing
  * end-to-end at the SFs; this spec keeps the guarantee local and
  * fast, and documents WHICH form is the spec. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val queryTerms = Seq("spark", "window", "hash")

  /** The pre-r14 exploded form, verbatim — kept here as the reference
    * semantics (it is also what the DuckDB twin SQL describes). */
  private def bm25Reference(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col("text")))).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dlen"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dlen")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + (lit(0.75) * col("dlen")) / col("avgdl")))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfNorm, 6).cast("decimal(14,6)").as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).cast("double").as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(k)
  }

  test("single-pass BM25 == exploded reference form, bit-for-bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark window shuffle hash"),
      (2L, "the window   window pane"),           // repeated whitespace
      (3L, "hash join hash agg hash"),
      (4L, "nothing relevant here at all"),
      (5L, ""),                                    // empty text
      (7L, "spark"),                               // single-token doc
      (8L, "Spark WINDOW Hash mixed case")
    ).toDF("doc_id", "text")
      .unionByName(Seq((6L, Option.empty[String]))
        .toDF("doc_id", "text"))                   // NULL text
    val got = TextAnalysis.bm25TopK(docs, queryTerms, k = 10)
      .collect().toSeq
    val want = bm25Reference(docs, k = 10).collect().toSeq
    assert(got == want)
    // sanity on the fixture itself: ties and subsets actually occurred
    assert(want.nonEmpty && want.size >= 4)
  }

  test("NULL/empty docs enter n_docs exactly like the exploded form") {
    import spark.implicits._
    // reference: explode drops NULL-text docs (no token rows) but keeps
    // the empty-string doc (one "" token); the array form must agree
    val docs = Seq((1L, "spark a b"), (2L, "")).toDF("doc_id", "text")
      .unionByName(Seq((3L, Option.empty[String])).toDF("doc_id", "text"))
    val got = TextAnalysis.bm25TopK(docs, queryTerms, k = 10).collect()
    val want = bm25Reference(docs, k = 10).collect()
    assert(got.toSeq == want.toSeq)
  }
}
