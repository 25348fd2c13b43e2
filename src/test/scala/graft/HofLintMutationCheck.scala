package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Negative control for [[HofInliningLintSpec]]: the lint must FLAG the
  * pre-fix t19/quantizeInt8 shapes — otherwise a traversal bug would let
  * it pass vacuously on the whole registry. */
class HofLintMutationCheck extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lint(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val m = classOf[HofInliningLintSpec].getDeclaredMethod(
      "offenders",
      classOf[org.apache.spark.sql.catalyst.expressions.Expression],
      classOf[Set[Long]], classOf[Boolean])
    m.setAccessible(true)
    val inst = new HofInliningLintSpec
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    plan.flatMap(_.expressions.flatMap { root =>
      m.invoke(inst, root, Set.empty[Long],
        java.lang.Boolean.valueOf(false))
        .asInstanceOf[Seq[
          org.apache.spark.sql.catalyst.expressions.Expression]]
        .map(_.sql)
    })
  }

  // file-backed input: a literal LocalRelation would be constant-folded
  // by ConvertToLocalRelation and leave nothing to lint
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id").as("id"), col("text"))

  test("lint flags the pre-fix t19 shape (split re-run inside lambda) " +
      "and passes the materialized fix") {
    val toksExpr = split(lower(col("text")), " ")
    val bad = docs.select(col("id"),
      transform(sequence(lit(1), size(toksExpr) - 1),
        i => concat_ws(" ", element_at(toksExpr, i),
          element_at(toksExpr, i + 1))).as("bigrams"))
    assert(lint(bad).nonEmpty, "pre-fix t19 shape must be flagged")

    val good = docs.select(col("id"), toksExpr.as("toks"))
      .select(col("id"),
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1))).as("bigrams"))
    assert(lint(good).isEmpty, "materialized form must pass")
  }

  test("lint flags the pre-fix quantizeInt8 shape (array_max fold " +
      "inside the per-element lambda)") {
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mx = array_max(transform(col("v"), x => abs(x)))
    val bad = vecs.select(col("vec_id"),
      transform(col("v"), x =>
        round(x * lit(127.0) / mx).cast("tinyint")).as("q"))
    assert(lint(bad).nonEmpty, "pre-fix quantize shape must be flagged")
  }
}
