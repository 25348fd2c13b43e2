package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Bloom-filter membership probe as a native Catalyst expression WITH
  * whole-stage codegen. The filter rides along as an `array<bigint>`
  * literal (the words of a [[graft.agg.BloomFilter]] build), so a
  * broadcast-sized bit array gets tested against every scan row without
  * leaving the codegen span — the probe side of library-level semi-join
  * pruning. A Scala UDF here would break the span AND pay a per-row
  * array deserialization; this expression reads the Tungsten ArrayData
  * in place (SURVEY.md §7.3 decision table: custom code only where
  * built-ins can't express it — ANSI mode forbids the overflow-wrapping
  * Column arithmetic SplitMix64 needs, and Spark's own might_contain is
  * internal to its runtime-filter rewrite). */
case class BloomMightContain(hash: Expression, words: Expression,
    k: Expression) extends TernaryExpression {

  override def first: Expression = hash
  override def second: Expression = words
  override def third: Expression = k

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, words.dataType, k.dataType) match {
      case (LongType, ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects (bigint, array<bigint>, int)")
    }

  override def nullSafeEval(h: Any, w: Any, kk: Any): Any =
    graft.agg.Bloom.mightContainData(w.asInstanceOf[ArrayData],
      h.asInstanceOf[Long], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, w, kk) => {
      s"${ev.value} = graft.agg.Bloom.mightContainData($w, $h, $kk);"
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

object BloomExprs {

  /** `bloom_might_contain(hash, words, k)` over Columns; pass the
    * built filter with `typedlit(words)` so it stays one literal. */
  def bloomMightContain(hash: Column, words: Column, k: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(hash),
      Bridge.expression(words), Bridge.expression(k)))
}
