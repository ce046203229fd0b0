// Lives in the org.apache.spark.sql namespace to reach the
// private[sql] classic Column<->Expression converters — the standard
// technique for Spark extension libraries that define native Catalyst
// expressions (Spark 4's Column wraps a ColumnNode, not an Expression).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

object Bridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) LogicalPlan as a DataFrame — how extension
    * libraries surface custom logical operators as user API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session (the
    * runtime analogue of SparkSessionExtensions.injectPlannerStrategy). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    // extraStrategies is a plain var — serialize the check-then-append
    // so concurrent registrations can't drop each other's strategies
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }

  /** Idempotently add an optimizer rule to a live session (the
    * runtime analogue of SparkSessionExtensions.injectOptimizerRule). */
  def addOptimization(spark: SparkSession,
                      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(r))
        exp.extraOptimizations = exp.extraOptimizations :+ r
    }
  }
}
