package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve data layout — the locality-preserving alternative to
  * [[ZOrder]]. The Hilbert curve visits grid cells so that CONSECUTIVE
  * curve positions are always grid-adjacent (Manhattan distance 1);
  * Morton/Z-order jumps across the space at quadrant boundaries. For
  * file layout that means Hilbert-ranged files cover tighter rectangles
  * on average — the curve Delta Lake's liquid clustering and modern
  * OPTIMIZE implementations moved to, for exactly this reason.
  *
  * The index needs per-level conditional rotation/reflection state, so
  * unlike the z-value's pure shift/or chain it cannot be a flat Column
  * expression — it is a native codegen'd Catalyst expression calling a
  * tight static loop (same decision as BloomMightContain: custom code
  * only where Column algebra can't express it). */
object Hilbert {

  /** xy→d for a 2^order × 2^order grid (classic iterative rotate-and-
    * accumulate; Wikipedia's public-domain formulation). Pure integer
    * math, deterministic everywhere; d < 4^order ≤ 2^62. */
  def index(xIn: Long, yIn: Long, order: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is consistent
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** `hilbert_index(x, y, order)` over Columns (non-negative ints
    * bucketed below 2^order, e.g. via [[ZOrder.bucketed]]). */
  def hilbertIndex(x: Column, y: Column, order: Int): Column =
    Bridge.column(HilbertIndex(Bridge.expression(x),
      Bridge.expression(y),
      Bridge.expression(org.apache.spark.sql.functions.lit(order))))

  /** Rewrite `df` Hilbert-ordered on two bucketed dims — the same
    * range-partition + in-partition sort shape as
    * [[ZOrder.writeZOrdered]], only the curve differs. */
  def writeHilbertOrdered(df: org.apache.spark.sql.DataFrame,
      dimA: Column, dimB: Column, path: String, numFiles: Int,
      order: Int = 16): Unit = {
    val h = "_graft_h"
    df.withColumn(h, hilbertIndex(dimA, dimB, order))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col(h))
      .sortWithinPartitions(org.apache.spark.sql.functions.col(h))
      .drop(h)
      .write.mode("overwrite").parquet(path)
  }
}

/** Codegen'd Hilbert index: stays inside the WholeStageCodegen span of
  * the scan computing the layout key. */
case class HilbertIndex(x: Expression, y: Expression, order: Expression)
    extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = order

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (x.dataType, y.dataType, order.dataType) match {
      case (LongType, LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "hilbert_index expects (bigint, bigint, int)")
    }

  override def nullSafeEval(xv: Any, yv: Any, ov: Any): Any =
    Hilbert.index(xv.asInstanceOf[Long], yv.asInstanceOf[Long],
      ov.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv, ov) => {
      s"${ev.value} = graft.io.Hilbert.index($xv, $yv, $ov);"
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}
