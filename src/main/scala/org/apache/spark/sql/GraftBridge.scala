package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters — the
  * standard technique for libraries that ship custom Catalyst expressions
  * (the alternative, registering every expression as a SQL function, cannot
  * serve sessions created by external drivers). This is the only file that
  * reaches into Spark's package-private surface.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
