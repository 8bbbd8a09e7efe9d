package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression conversions for
  * graft's native Catalyst expressions (Spark 4 removed the public
  * `Column.expr` / `new Column(expr)` surface; this is the supported
  * extension-library pattern).
  */
object GraftBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
