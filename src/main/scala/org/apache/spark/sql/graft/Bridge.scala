package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the `Column` ↔ Catalyst `Expression` bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). This
  * shim re-exports the two conversions for graft's custom expressions
  * (same technique every Spark extension library uses).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
