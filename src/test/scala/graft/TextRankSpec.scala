package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** TextRank keywords: centrality beats raw frequency, self-adjacency
  * contributes nothing, and normalization folds case before the graph
  * is built. */
class TextRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a hub term linked to many distinct neighbors outranks a term " +
    "that merely repeats inside one pair") {
    // 'hub' co-occurs with six distinct words once each; 'x'/'y'
    // co-occur with only each other but ten times as many tokens
    val docs = (Seq("hub a", "hub b", "hub c", "hub d", "hub e",
      "hub f") ++ Seq.fill(10)("x y")).toDF("text")
    val out = TextAnalysis.textRankKeywords(docs, topN = 3)
      .collect().map(_.getString(0))
    assert(out.head === "hub",
      s"graph centrality must beat pair frequency, got ${out.toSeq}")
  }

  test("a self-adjacent token forms no edge and vanishes from the " +
    "graph; case folds before tokenization") {
    val docs = Seq("aa aa aa", "Word word", "p q").toDF("text")
    val out = TextAnalysis.textRankKeywords(docs).collect()
      .map(_.getString(0)).toSet
    assert(!out.contains("aa"), "self-pairs are filtered")
    assert(!out.contains("Word") && !out.contains("word"),
      "the only pair left is word-word after lowering = a self-pair")
  }

  test("two symmetric terms tie exactly and break by term order in " +
    "the top-N cut") {
    val docs = Seq("left right").toDF("text")
    val rows = TextAnalysis.textRankKeywords(docs, topN = 1).collect()
    assert(rows.head.getString(0) === "left",
      "equal rank_units tie-breaks on the lexicographically first term")
  }
}
