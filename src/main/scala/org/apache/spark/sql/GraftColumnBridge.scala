package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression conversion for graft's native expressions.
  * `classic.ExpressionUtils` is private[sql] in Spark 4, so the bridge lives
  * in the org.apache.spark.sql package — the standard pattern for libraries
  * that ship custom Catalyst expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
