package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why custom: multilingual corpus cleaning must canonicalize combining
  * sequences (e + U+0301 vs precomposed é) BEFORE fingerprinting or
  * dedup — otherwise visually identical documents hash apart — and Spark
  * ships no normalization builtin (`org.apache.spark.sql.functions` has
  * none as of 4.x), while the oracle side (DuckDB `nfc_normalize`) does.
  * Same altitude decision as [[DotProduct]]: a scalar hole in the builtin
  * surface, filled with a codegen'd expression rather than a UDF (a UDF
  * would break the surrounding WholeStageCodegen span and serialize to
  * JVM String anyway — this expression pays the String round-trip only
  * when the input is not already NFC-normalized ASCII, the common case
  * short-circuited by `Normalizer.isNormalized`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("graft_nfc expects a string argument")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(newChild)
}

object NfcNormalize {
  /** Shared by interpreted + codegen paths. ASCII (and any already-NFC
    * string) returns the input buffer untouched — no allocation. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
