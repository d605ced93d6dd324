package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the `private[sql]` Dataset constructors — required by
  * libraries that introduce their own [[LogicalPlan]] nodes (the
  * documented custom-operator path: logical node + planner strategy +
  * physical exec) and need to hand the composed plan back to the user
  * as an ordinary DataFrame. Same pattern as [[ColumnBridge]].
  */
object DatasetBridge {

  /** Wrap a logical plan as a DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a live session. */
  def addStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val cur = cs.experimental.extraStrategies
    if (!cur.contains(strategy)) {
      cs.experimental.extraStrategies = cur :+ strategy
    }
  }
}
