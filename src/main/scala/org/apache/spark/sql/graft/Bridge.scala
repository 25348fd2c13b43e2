package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst Expression converters private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives in
  * the org.apache.spark.sql package solely to re-export them for graft's
  * custom expressions — the standard extension-library technique. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
