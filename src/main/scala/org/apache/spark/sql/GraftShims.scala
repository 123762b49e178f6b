package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ↔ Expression converters, so graft's
  * native Catalyst expressions can expose a public Column API (the same
  * mechanism spark-connect-compatible extension libraries use). */
object GraftShims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
