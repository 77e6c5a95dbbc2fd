package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ⇄ Expression conversions, which are
  * `private[sql]` in Spark 4 (Column became ColumnNode-based and no longer
  * exposes `.expr`). This is the standard extension-library pattern for
  * registering custom Catalyst expressions as user-facing Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
