package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 / builder guidance
  * preference (b)): SimHash needs 64 signed bit-counters updated per
  * token hash in ONE pass. Composing it from built-ins requires 64
  * independent `aggregate()` traversals of the array (see the reference
  * composition kept in [[graft.operators.Dedup.simhash64Builtin]]) —
  * semantically correct but 64× the work and a pathological expression
  * tree. This expression does the single pass, with codegen (`doGenCode`
  * emits the loop directly into the generated Java) so it fuses into
  * whole-stage codegen like any built-in.
  *
  * Token hashing matches Spark's `xxhash64` SQL function (XXH64, seed
  * 42) so signatures are stable across the engine.
  */
case class SimHash64Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64Expression.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Expression.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64Expression {

  /** Single-pass SimHash kernel (called from both eval and codegen). */
  def compute(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = hashToken(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Same hash as Spark SQL's xxhash64(string): XXH64 over the UTF-8
    * bytes with seed 42.
    */
  def hashToken(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  /** Column-level entry point. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64Expression(ColumnBridge.expression(tokens)))
  }

  /** Register `graft_simhash64` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expression(exprs.head), "scala_udf")
}

/** Native k-element MinHash signature over a shingle array — one pass
  * over the array computing all k minima (hash family = XXH64 with seed
  * i), versus k separate `transform`+`array_min` traversals when composed
  * from built-ins. Codegen'd via a static kernel, same pattern as
  * [[SimHash64Expression]].
  */
case class MinHash64Expression(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires array<string> and k>0, got ${other.catalogString}, k=$k")
    }

  override def nullSafeEval(input: Any): Any =
    MinHash64Expression.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash64Expression.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHash64Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash64"
}

object MinHash64Expression {

  /** One pass over the shingles; k running minima. Empty/all-null arrays
    * yield Long.MaxValue slots (a stable "no content" signature).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def minhash64(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHash64Expression(ColumnBridge.expression(shingles), k))
  }
}
