package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression WITH whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: Spark's higher-order
  * functions are interpreted — each element evaluation goes through a
  * lambda-variable indirection, which is ~100× slower than a fused loop
  * and breaks the surrounding WholeStageCodegen span. For similarity
  * search the dot product IS the hot loop (|pairs|·dim evaluations), so
  * this is the one place the engine drops to a custom `Expression`
  * (SURVEY.md §7.3 decision table: custom code only where built-ins can't
  * express the performance).
  *
  * Sequential left-to-right accumulation — deterministic, and identical
  * to DuckDB's `list_dot_product` evaluation order, keeping the oracle
  * comparison exact (before the 4-decimal rounding both sides apply).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("dot_product expects two array<double> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Cosine similarity of two `array<double>` columns, fused into ONE array
  * traversal: dot, |a|² and |b|² accumulate in the same loop. The
  * composed form `dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b)))` walks the
  * arrays three times and re-reads both from Tungsten memory each pass —
  * in the LSH near-dup verify (|candidate pairs|·dim element reads) the
  * fusion is a ~3× cut on the hot loop.
  *
  * Float caveat: the result is bit-identical to the composed form
  * because each accumulator keeps the same left-to-right order the
  * separate passes use; the final combination `d / (sqrt(na)·sqrt(nb))`
  * mirrors the composed expression tree exactly. On unequal-length
  * inputs the dot runs over the common prefix (as `zip_with` would) but
  * each norm covers its OWN full array — matching `dot(a,a)`/`dot(b,b)`
  * in the composed form. Zero-norm inputs yield NaN/Infinity exactly as
  * the composed form does. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("cosine_sim expects two array<double> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      d += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // norm tails beyond the common prefix (no-ops when lengths match)
    while (i < nx) { val xi = x.getDouble(i); na += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getDouble(i); nb += yi * yi; i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $d += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |for (; $i < $nx; $i++) {
         |  double $xi = $a.getDouble($i); $na += $xi * $xi;
         |}
         |for ($i = $n; $i < $ny; $i++) {
         |  double $yi = $b.getDouble($i); $nb += $yi * $yi;
         |}
         |${ev.value} = $d /
         |  (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[CosineSim]]. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
