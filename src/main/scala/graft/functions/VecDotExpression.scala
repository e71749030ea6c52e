package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dense dot product over `array<float>` / `array<double>`.
  *
  * The built-in composition (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates a boxed intermediate array per row and evaluates two lambda
  * closures per element — measured as the dominant cost of every
  * vector-similarity operator at sf0.1. This kernel reads both arrays
  * with primitive accessors in one fused loop: no allocation, no boxing,
  * SIMD-friendly.
  *
  * Mixed float/double inputs are accumulated in double (same promotion
  * as the composition it replaces). Lengths must match — enforced with
  * an exception rather than zip_with's silent null, which would poison
  * the aggregate downstream.
  */
case class VecDotExpression(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> operands, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(dt: DataType) = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotExpression.compute(
      a.asInstanceOf[ArrayData], isFloat(left.dataType),
      b.asInstanceOf[ArrayData], isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDotExpression.compute(" +
        s"$a, ${isFloat(left.dataType)}, $b, ${isFloat(right.dataType)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_dot"
}

/** Native Jaccard similarity over two `array<long>` columns (as sets):
  * |A∩B| / |A∪B| in one pass with two hash sets, versus the
  * `array_intersect` + `array_union` composition which materializes two
  * intermediate arrays per row and walks the inputs twice. Duplicate
  * elements are collapsed exactly like the set-semantics built-ins.
  */
case class JaccardLongExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_long requires two array<long> operands, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardLongExpression.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardLongExpression.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard_long"
}

object JaccardLongExpression {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val setA = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { if (!a.isNullAt(i)) setA.add(a.getLong(i)); i += 1 }
    val nb = b.numElements()
    val seenB = new java.util.HashSet[java.lang.Long](nb * 2)
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < nb) {
      if (!b.isNullAt(i)) {
        val v: java.lang.Long = b.getLong(i)
        if (seenB.add(v)) {
          if (setA.contains(v)) inter += 1 else bOnly += 1
        }
      }
      i += 1
    }
    val union = setA.size + bOnly
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  def jaccardLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(JaccardLongExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Native random-hyperplane LSH signature: `nBits` sign bits packed in
  * a long, one fused loop per vector. Bit p equals
  * [[VectorFunctions.hyperplaneSign]] for plane p — the hyperplane
  * "random" units replicate `pmod(xxhash64(plane, dim), 1000003)`
  * exactly (XXH64 int-chaining, seed 42), so buckets are identical to
  * the built-in composition while skipping its per-plane boxed
  * zip_with/aggregate passes.
  */
case class LshSign64Expression(child: Expression, nBits: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) if nBits > 0 && nBits <= 64 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lshsign64 requires array<float|double> and 0<nBits<=64, got ${other.catalogString}, nBits=$nBits")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    LshSign64Expression.compute(input.asInstanceOf[ArrayData], isFloat, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshSign64Expression.compute($c, $isFloat, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): LshSign64Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lshsign64"
}

object LshSign64Expression {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def compute(arr: ArrayData, isFloat: Boolean, nBits: Int): Long = {
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < nBits) {
      // matches xxhash64(lit(plane), dimIdx): ints chained from seed 42
      val hPlane = XXH64.hashInt(p, 42L)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, hPlane)
        val unit = java.lang.Math.floorMod(h, 1000003L).toDouble / 1000003.0 - 0.5
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += v * unit
        i += 1
      }
      if (proj >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def lshSign64(vec: Column, nBits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LshSign64Expression(ColumnBridge.expression(vec), nBits))
  }
}

/** Native integer dot product over two `array<int>` columns — the
  * quantized-ANN phase-1 scorer. The
  * `aggregate(zip_with(a, b, (x, y) => (x*y).cast(long)), 0L, _+_)`
  * composition it replaces is interpreted per element (HOF lambdas
  * never enter codegen) and allocates a boxed intermediate array per
  * scored pair — the dominant cost of every SQ/IVF-SQ phase-1 scan at
  * sf0.1. Accumulates `a(i).toLong * b(i)` in index order: identical
  * values to the fold for every input (int8-range codes are far inside
  * long). Length mismatch raises loudly, the [[VecDotExpression]]
  * contract (zip_with would pad with null and poison the sum to null).
  */
case class VecDotIntExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot_int requires two array<int> operands, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotIntExpression.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDotIntExpression.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotIntExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_dot_int"
}

object VecDotIntExpression {

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot_int length mismatch: $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      // null element = corrupt code vector: raise loudly (the
      // zip_with+aggregate fold this kernel replaced null-poisoned the
      // whole sum — getInt on a null slot would silently read 0 here)
      require(!a.isNullAt(i) && !b.isNullAt(i),
        s"vec_dot_int: null element at index $i — code vectors must be null-free")
      acc += a.getInt(i).toLong * b.getInt(i); i += 1
    }
    acc
  }

  def vecDotInt(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VecDotIntExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Native squared-L2 distance over two `array<double>` columns — the
  * PQ encode argmin's per-codeword distance. Accumulates
  * `(a(i)−b(i))·(a(i)−b(i))` in index order: bit-identical IEEE
  * doubles to the pinned-order `aggregate(zip_with(...))` fold it
  * replaces — the PQ oracle replays that exact op sequence, so the
  * kernel must (and does) preserve it. Length mismatch raises loudly.
  */
case class VecL2SqExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_l2sq requires two array<double> operands, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecL2SqExpression.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecL2SqExpression.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2SqExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_l2sq"
}

object VecL2SqExpression {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_l2sq length mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element = corrupt vector: raise loudly instead of the
      // silent read-as-0.0 getDouble would perform on a null slot
      require(!a.isNullAt(i) && !b.isNullAt(i),
        s"vec_l2sq: null element at index $i — vectors must be null-free")
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def vecL2Sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VecL2SqExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

object VecDotExpression {

  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot length mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (!aFloat && !bFloat) {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    } else {
      val (f, d) = if (aFloat) (a, b) else (b, a)
      while (i < n) { acc += f.getFloat(i).toDouble * d.getDouble(i); i += 1 }
    }
    acc
  }

  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VecDotExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Register `graft_vec_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", exprs => VecDotExpression(exprs.head, exprs(1)), "scala_udf")
}
