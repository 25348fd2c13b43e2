package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** R1 (EPA breakpoint interpolation) as a native Catalyst expression.
  *
  * Why not the when-chain (`Aqi.aqiWhenChain`): the chain is 6 pollutants
  * × up to 6 bands × an interpolation each — ~200 Catalyst nodes. Fused
  * into the medallion parse projection together with R2/R3 and the
  * events→wire mapping, the generated `processNext` exceeds janino's
  * 64 KB method limit and Spark silently falls back to INTERPRETED
  * evaluation for the whole stage (`WARN WholeStageCodegenExec: ... Code
  * grows beyond 64 KB`) — on the per-row hot path that runs over every
  * byte of a 100 TB corpus. This expression generates ONE static call
  * into [[AqiKernel]] (a table-driven band search), so the projection
  * stays a few dozen bytes of bytecode and the stage keeps whole-stage
  * codegen (pinned by PlanShapeSpec).
  *
  * Semantics are IDENTICAL to the when-chain (AqiExprSpec sweeps a dense
  * grid including band edges, gaps, clamps, ties, NaN, negatives, nulls
  * and unknown pollutants): reference behavior from the reference's
  * `aqi_calculator.py:8-128` — inter-band gaps → null, above-top-band
  * clamps to 500, negative/NaN/unknown → null, HALF_UP rounding exactly
  * like Spark's `round` (BigDecimal.valueOf, scale 0).
  */
case class AqiBreakpoint(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "aqi_breakpoint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "aqi_breakpoint expects (string parameter, double concentration)")

  // NaN is the kernel's "no AQI" sentinel — a real AQI is never NaN
  override def nullSafeEval(p: Any, v: Any): Any = {
    val r = AqiKernel.aqiOrNaN(p.asInstanceOf[UTF8String],
      v.asInstanceOf[Double])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, v) => {
      s"""
         |${ev.value} = graft.expr.AqiKernel.aqiOrNaN($p, $v);
         |if (java.lang.Double.isNaN(${ev.value})) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = -1.0;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Table-driven AQI band search shared by interpreted eval and the
  * generated code. The tables are built from [[Aqi.breakpoints]] — the
  * single source of truth the when-chain and the DuckDB SQL twin also
  * derive from, so all three forms stay in lockstep by construction. */
object AqiKernel {

  private val params: Array[UTF8String] =
    Aqi.breakpoints.map(p => UTF8String.fromString(p._1)).toArray
  private val cLo: Array[Array[Double]] =
    Aqi.breakpoints.map(_._2.map(_.cLo).toArray).toArray
  private val cHi: Array[Array[Double]] =
    Aqi.breakpoints.map(_._2.map(_.cHi).toArray).toArray
  private val iLo: Array[Array[Double]] =
    Aqi.breakpoints.map(_._2.map(_.iLo.toDouble).toArray).toArray
  private val slope: Array[Array[Double]] =
    Aqi.breakpoints.map(_._2.map(_.slope).toArray).toArray

  /** AQI for (parameter, concentration); Double.NaN = "no AQI" (null):
    * negative/NaN input, unknown pollutant, or an inter-band gap. */
  def aqiOrNaN(parameter: UTF8String, v: Double): Double = {
    if (java.lang.Double.isNaN(v) || v < 0) return Double.NaN
    var pi = 0
    while (pi < params.length && !params(pi).equals(parameter)) pi += 1
    if (pi == params.length) return Double.NaN
    val lo = cLo(pi); val hi = cHi(pi)
    var i = 0
    while (i < lo.length) {
      // same band predicate + interpolation the when-chain evaluates
      if (v >= lo(i) && v <= hi(i)) return halfUp(
        slope(pi)(i) * (v - lo(i)) + iLo(pi)(i))
      i += 1
    }
    if (v > hi(hi.length - 1)) 500.0 else Double.NaN
  }

  /** Spark's `round(double)` semantics: HALF_UP at scale 0 over the
    * shortest decimal representation (BigDecimal.valueOf). */
  private def halfUp(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
}

object AqiExprs {
  /** Column API for [[AqiBreakpoint]]. */
  def aqiBreakpoint(parameter: Column, value: Column): Column =
    Bridge.column(AqiBreakpoint(
      Bridge.expression(parameter), Bridge.expression(value)))
}
