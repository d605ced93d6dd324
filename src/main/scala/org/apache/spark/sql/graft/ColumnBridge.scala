package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * the supported pattern for libraries shipping custom Catalyst
  * expressions against Spark 4's decoupled Column API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-plan a DataFrame's logical plan from scratch under the
    * SESSION'S CURRENT confs and return the fresh physical plan.
    * `df.queryExecution.executedPlan` is a memoized lazy val — once an
    * action has forced it (with AQE on, as an opaque
    * AdaptiveSparkPlanExec leaf), later conf toggles are silently
    * ignored; plan-inspection tools need a fresh execution instead. */
  def freshExecutedPlan(
      df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    new org.apache.spark.sql.execution.QueryExecution(
      classic.sparkSession, classic.queryExecution.logical).executedPlan
  }
}
