package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column conversions for custom Catalyst expressions.
  * Spark 4 made these `private[sql]` (Connect refactor), so the
  * accessor lives in an org.apache.spark.sql subpackage — the
  * standard pattern for third-party Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
