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

  /** DataFrame from a raw LogicalPlan (`Dataset.ofRows` went
    * `private[sql]` in Spark 4) — needed to hand a custom logical node
    * to the analyzer. */
  def ofRows(s: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** EAGER Column → catalyst Expression conversion. `expression(c)`
    * returns a lazy `ColumnNodeExpression` adapter, which is fine
    * inside plans the analyzer rewrites but is NOT serializable if it
    * survives into a task closure (e.g. inside a custom LogicalPlan's
    * expressions). This converts through the classic session's column
    * node converter immediately — sort orders come back as real
    * catalyst `SortOrder`s. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** The session's experimental-strategy hook (classic API). */
  def addStrategy(s: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }

  /** The session's experimental post-hoc optimizer-rule hook — rules
    * run AFTER Spark's own batches, so a graft rewrite sees the final
    * optimized shape (filters already pushed/split, projects
    * collapsed). */
  def addOptimization(s: org.apache.spark.sql.SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(rule))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ rule
  }
}
