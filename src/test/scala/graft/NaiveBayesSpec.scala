package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.NaiveBayes

/** Naive Bayes on planted vocabulary-separated classes: the model
  * must recover obvious class structure and break argmax ties
  * deterministically. */
class NaiveBayesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("separable vocabularies classify perfectly on held-in data") {
    // class A speaks only {apple banana}, class B only {carrot daikon}
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "apple banana apple", "A")
      else (i.toLong, "carrot daikon carrot", "B")
    }.toDF("doc_id", "text", "cls")
    val model = NaiveBayes.train(docs)
    val pred = NaiveBayes.predict(
      Seq((100L, "banana apple banana"), (101L, "daikon daikon carrot"))
        .toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(100L -> "A", 101L -> "B"))
  }

  test("priors break a feature tie toward the larger class") {
    // shared vocabulary, 3:1 class imbalance: an ambiguous doc goes to
    // the majority class on the prior
    val docs = ((0 until 9).map(i => (i.toLong, "same words here", "big"))
      ++ Seq((9L, "same words here", "small")))
      .toDF("doc_id", "text", "cls")
    val model = NaiveBayes.train(docs)
    val pred = NaiveBayes.predict(
      Seq((100L, "same words")).toDF("doc_id", "text"), model)
      .collect().head.getString(1)
    assert(pred === "big")
  }

  test("exact score ties break toward the lexicographically smallest " +
    "class") {
    // perfectly symmetric classes -> identical scores for a symmetric
    // doc; the deterministic tie-break must pick 'A'
    val docs = Seq(
      (0L, "xx yy", "B"), (1L, "xx yy", "A"))
      .toDF("doc_id", "text", "cls")
    val model = NaiveBayes.train(docs)
    val pred = NaiveBayes.predict(
      Seq((100L, "xx yy")).toDF("doc_id", "text"), model)
      .collect().head.getString(1)
    assert(pred === "A")
  }

  test("confusion on the sf0.001 documents table is diagonal-heavy " +
    "and covers only held-out docs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang").as("cls"))
    val cm = NaiveBayes.confusion(docs).collect()
    val total = cm.map(_.getLong(2)).sum
    val diag = cm.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(total > 0)
    // languages in the synthetic corpus share a token pool, so demand
    // only better-than-plurality structure, not perfection
    assert(diag * 5 >= total,
      s"diagonal $diag of $total is no better than chance")
  }
}
