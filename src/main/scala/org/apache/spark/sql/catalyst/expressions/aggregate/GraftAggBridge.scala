package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-local bridge to the `private[aggregate]` bounded top-k
  * aggregate (`CollectTopK`, collect.scala) — consumed through
  * [[org.apache.spark.sql.graftbridge.ColumnBridge.collectTopK]].
  */
object GraftAggBridge {
  def collectTopK(e: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(e, k, reverse).toAggregateExpression()
}
