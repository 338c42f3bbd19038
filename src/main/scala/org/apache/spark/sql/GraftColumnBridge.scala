package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column↔Expression converters, which are
  * `private[sql]` in Spark 4 (Column is backed by ColumnNode there; the
  * pre-4.x `new Column(expr)` constructor is gone). Lives in the spark.sql
  * package solely to re-export the two conversions graft's custom Catalyst
  * expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
