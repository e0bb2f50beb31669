package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters —
  * the standard extension-library shim for constructing `Column`s over
  * custom Catalyst expressions whose state (closure matrices) cannot
  * ride through the function registry as literal children. Spark 4
  * moved the old public `Column(expr)` constructor behind
  * `classic.ExpressionUtils`; this is the only file that needs to live
  * in the org.apache.spark.sql package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
