package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** First and second moments of a vector column in ONE corpus pass —
  * the distributed half of PCA ([[graft.operators.Pca]]): count, the
  * per-dimension sum, and the upper triangle of the Gram matrix
  * `Σ x·xᵀ`, packed into a single flat buffer of
  * `1 + d + d(d+1)/2` doubles.
  *
  * This is the aggregate the 100 TB path needs: the obvious
  * `posexplode × posexplode` spelling blows every input row up into
  * d² rows (4096× at d=64) BEFORE the aggregation, whereas this
  * buffer is O(d²) per partial regardless of corpus size — map-side
  * partials collapse each partition to one buffer, the single shuffle
  * carries `partitions` buffers, and merge is element-wise addition
  * (exactly mergeable, order-insensitive up to floating-point
  * rounding — PCA's own tolerance dwarfs the ulp noise).
  *
  * `d` is a constructor parameter, capped at 512 (a d=512 buffer is
  * ~1 MB — fine as a per-partition partial, reckless much beyond).
  * Rows whose array is null, or whose length differs from `d`, fail
  * loudly: a silent skip would bias the covariance.
  */
case class VecMomentsExpression(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(d >= 2 && d <= 512, s"vector moments dim must be in [2, 512], got $d")

  private val bufLen = 1 + d + d * (d + 1) / 2

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    vec.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vector moments input must be ARRAY<DOUBLE>, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) throw new IllegalArgumentException(
      "vector moments: null embedding row (filter or impute before fitting)")
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != d) throw new IllegalArgumentException(
      s"vector moments: expected dim $d, got a row with ${arr.numElements()}")
    // a null ELEMENT would read as 0.0 through toDoubleArray and
    // silently bias the covariance — the exact failure the null-row
    // guard above exists to prevent
    var nc = 0
    while (nc < d) {
      if (arr.isNullAt(nc)) throw new IllegalArgumentException(
        s"vector moments: null element at dim $nc (filter or impute before fitting)")
      nc += 1
    }
    val x = arr.toDoubleArray()
    buf(0) += 1.0
    var i = 0
    var tri = 1 + d
    while (i < d) {
      buf(1 + i) += x(i)
      var j = i
      while (j < d) {
        buf(tri) += x(i) * x(j)
        tri += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bufLen)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vec)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMomentsExpression =
    copy(vec = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsExpression =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_vec_moments"
}

object VecMomentsExpression {

  /** `vecMoments(vec, d)` — one-pass count/sum/Gram aggregate Column
    * over an `array<double>` vector column of known dimension `d`.
    * Layout of the returned array: `[count, sum_0..sum_{d-1},
    * gram_{0,0}, gram_{0,1}, .., gram_{0,d-1}, gram_{1,1}, ..]`
    * (row-major upper triangle).
    */
  def vecMoments(vec: Column, d: Int): Column =
    ColumnBridge.column(
      VecMomentsExpression(
        ColumnBridge.expression(vec.cast(ArrayType(DoubleType))),
        d).toAggregateExpression())
}
