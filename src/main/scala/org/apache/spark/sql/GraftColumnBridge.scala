package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters — the standard
  * ecosystem pattern (frameless, deequ) for exposing custom Catalyst
  * expressions through the public Column API on Spark 4's column-node
  * architecture.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
