package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst Expression converters private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives in
  * the org.apache.spark.sql package solely to re-export them for graft's
  * custom expressions — the standard extension-library technique. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → Expression conversion. [[expression]] returns a
    * lazy ColumnNodeExpression wrapper that hides the real tree from
    * plan transforms (a `transformAllExpressions` over a plan holding
    * one sees a single opaque node); this converts through the classic
    * ColumnNode converter immediately, so the tree (including
    * still-unresolved function applications) is visible to rewrites
    * that need to see or count specific expression classes. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-exported `Dataset.ofRows` (private[sql] in Spark 4) — used by
    * the rounding-robustness audit to re-execute a query's analyzed
    * plan after an expression rewrite (Round → BRound). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
