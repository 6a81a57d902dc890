package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column⇄Expression converters, so graft's
 * native Catalyst expressions can be exposed as user-facing Columns.
 * (Spark 4 moved Column construction behind ColumnNode; this is the
 * supported classic-path conversion, just package-private.) */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
