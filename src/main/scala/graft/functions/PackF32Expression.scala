package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** `array<float>` → float32 little-endian `binary` — the JDBC carrier
  * for vector columns. Engines the reference targets have no portable
  * ARRAY type (its own vector-free tables ride BLOB passthrough,
  * /root/reference/cmd/root.go:398-399), so a migration of the
  * LLM-pipeline tables packs each embedding into 4·dim bytes that any
  * destination stores as BLOB/VARBINARY, byte-exact and
  * dimension-preserving. [[UnpackF32Expression]] is the exact inverse
  * on read-back; [[graft.sinks.ArrayCarrier]] owns the schema-carrier
  * naming convention that tells the reader which binary columns are
  * packed vectors.
  *
  * Little-endian is pinned (not platform order) so a table written on
  * one architecture reads back identically on any other. NULL elements
  * are rejected loudly: a silent sentinel would corrupt every
  * downstream dot product after round-trip.
  */
case class PackF32Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_f32 requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackF32Expression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackF32Expression.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PackF32Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pack_f32"
}

object PackF32Expression {

  def compute(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"pack_f32: NULL element at index $i — a packed vector has no null slot")
      val bits = java.lang.Float.floatToRawIntBits(arr.getFloat(i))
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  def packF32(vec: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PackF32Expression(ColumnBridge.expression(vec)))
  }
}

/** `binary` (float32-LE) → `array<float>`: exact inverse of
  * [[PackF32Expression]]. Rejects lengths that are not a multiple of 4
  * — truncated payloads must fail the read, not yield a silently
  * shorter vector.
  */
case class UnpackF32Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_f32 requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnpackF32Expression.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnpackF32Expression.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): UnpackF32Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_unpack_f32"
}

object UnpackF32Expression {

  def compute(bytes: Array[Byte]): ArrayData = {
    require(bytes.length % 4 == 0,
      s"unpack_f32: payload of ${bytes.length} bytes is not a whole number of float32s")
    val n = bytes.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val o = i * 4
      val bits = (bytes(o) & 0xff) |
        ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) |
        ((bytes(o + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    new GenericArrayData(out)
  }

  def unpackF32(bin: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(UnpackF32Expression(ColumnBridge.expression(bin)))
  }
}
