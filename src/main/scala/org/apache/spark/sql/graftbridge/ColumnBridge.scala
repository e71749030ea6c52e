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

  /** Bounded top-k aggregate (`CollectTopK`): a k-bounded priority queue
    * per group — O(k) state in update AND merge, unlike
    * `slice(array_sort(collect_list(...)))` whose partial buffer grows
    * with the group. `reverse = true` keeps the k SMALLEST by the
    * child's natural ordering. Output array order is queue order —
    * callers sort the k survivors themselves.
    */
  def collectTopK(e: Column, k: Int, reverse: Boolean): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftAggBridge.collectTopK(expression(e), k, reverse))
}
