package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * required for exposing custom Catalyst expressions as user-facing
  * Columns (the classic pre-4.0 `new Column(expr)` constructor is gone).
  * Lives under org.apache.spark.sql so the package-private access
  * resolves.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
