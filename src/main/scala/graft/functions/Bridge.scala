// Lives in the org.apache.spark.sql namespace to reach the
// private[sql] classic Column<->Expression converters — the standard
// technique for Spark extension libraries that define native Catalyst
// expressions (Spark 4's Column wraps a ColumnNode, not an Expression).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
