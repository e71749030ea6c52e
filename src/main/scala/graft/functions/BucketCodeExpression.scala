package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native quantile-bucket search: `#boundaries <= value` over a
  * boundary array attached via `addReferenceObj` (the
  * [[BpeEncodeExpression]] broadcast-constant shape). Replaces the
  * balanced nested-`when` tree the clustered-write path used: the tree
  * was codegen'd but WEIGHED ~5 KB of bytecode per column — a
  * single-use tree (the Hilbert path) pushed the whole-stage-codegen
  * method past HotSpot's 8000-byte JIT ceiling (measured
  * maxMethodCodeSize 10842 → the projection ran INTERPRETED, 1.7× the
  * write), where Morton's 6 reuses of each tree happened to trigger
  * subexpression elimination into separate small methods. The loop
  * here is identical arithmetic (upper-bound binary search; NaN takes
  * the TOP bucket, matching Spark SQL's total order — see [[compute]])
  * in
  * ~40 bytecodes of generated call site, JIT-hot for every curve and
  * every bits width.
  *
  * Null semantics: null in → null out (standard nullSafe); the caller
  * wraps with `coalesce(_, 0)` to keep the layout contract's
  * null → bucket 0 rule ([[graft.plans.ZOrder]]).
  */
case class BucketCodeExpression(child: Expression, bounds: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType if bounds.nonEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_code requires a double child and non-empty bounds, got ${other.catalogString}")
    }

  @transient private lazy val arr: Array[Double] = bounds.toArray

  override def nullSafeEval(input: Any): Any =
    BucketCodeExpression.compute(input.asInstanceOf[Double], arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketBounds", arr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BucketCodeExpression.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketCodeExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket_code"
}

object BucketCodeExpression {

  /** Upper-bound binary search: first index whose boundary exceeds
    * `v` = the count of boundaries ≤ v. NaN takes the TOP bucket:
    * Spark SQL's comparison operators use the total order where NaN
    * sorts above every double, so the `when(v >= bound)` tree sent NaN
    * all the way right — Java primitive comparisons would silently
    * send it to bucket 0 instead (ZOrderSpec's NaN case pins the SQL
    * behavior).
    */
  def compute(v: Double, bs: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return bs.length
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def bucketCode(v: Column, bounds: Seq[Double]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BucketCodeExpression(ColumnBridge.expression(v), bounds))
  }
}
