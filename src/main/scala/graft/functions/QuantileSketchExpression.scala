package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (deterministic Munro–Paterson/MRL-style
  * compactor) as a bounded-state Catalyst aggregate — the missing
  * member of the sketch family beside KMV (distinct counts) and
  * Misra–Gries / count–min (frequencies): rank statistics with O(c·L)
  * state per group whatever the row count, where an exact rank window
  * would sort the group's whole value stream.
  *
  * State is L levels of ≤ c longs; level l's items each stand for 2^l
  * original rows. A full level sorts and keeps the odd-indexed half at
  * doubled weight — deterministic (KLL randomizes the parity for
  * unbiasedness; we trade that for run-to-run reproducibility, the
  * house rule) — and every such halving perturbs any rank by at most
  * the level's weight. That perturbation accumulates in `err`, so the
  * output carries its own certificate: for any value v, the true rank
  * of v lies within `err` of the rank the sketch reports. With
  * c > the group's row count nothing ever compacts, `err = 0`, and the
  * sketch IS the exact multiset — the cross-engine oracle regime
  * (exactly how the MG gate pins its exact regime); the approximation
  * regime is spec-gated on the certificate, which holds under any
  * partitioning even though the raw items do not.
  *
  * Merge is level-wise concatenation plus the same cascade, so
  * per-shard sketches reduce associatively — the property that lets
  * 100 TB of per-shard summaries combine tree-wise with O(c·L) traffic
  * instead of re-scanning data (Agarwal et al., "Mergeable
  * Summaries").
  *
  * Output: `struct<err: bigint, items: array<struct<v, w>>>`, items
  * sorted (v, w) — deterministic whenever the item multiset is.
  * Callers read quantiles off the (value, weight) pairs with the exact
  * integer rank-selection arithmetic of
  * [[graft.operators.Sketches.sketchQuantiles]].
  */
case class QuantileSketchExpression(
    child: Expression,
    c: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchExpression.QsBuffer] {

  import QuantileSketchExpression.QsBuffer

  require(c >= 2 && c % 2 == 0, s"quantile sketch needs even capacity >= 2, got $c")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile sketch value must be BIGINT, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): QsBuffer = new QsBuffer

  override def update(buf: QsBuffer, input: InternalRow): QsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long], c)
    buf
  }

  override def merge(a: QsBuffer, b: QsBuffer): QsBuffer = { a.absorb(b, c); a }

  override def eval(buf: QsBuffer): Any = {
    // (v, w) pairs sorted by (v, w): deterministic for a given multiset
    val items = buf.allItems.sortBy(p => (p._1, p._2)).map { case (v, w) =>
      InternalRow(v, w)
    }
    InternalRow(buf.err, new GenericArrayData(items.toArray[Any]))
  }

  override def serialize(buf: QsBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): QsBuffer = QsBuffer.fromBytes(bytes)

  override def dataType: DataType = QuantileSketchExpression.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchExpression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchExpression =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_quantile_sketch"
}

object QuantileSketchExpression {

  val OutType: StructType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Mutable sketch state: per-level item buffers plus the carried
    * rank-error budget. Level l items have weight 2^l.
    */
  final class QsBuffer {
    var levels: Array[scala.collection.mutable.ArrayBuffer[Long]] =
      Array(new scala.collection.mutable.ArrayBuffer[Long])
    var err: Long = 0L

    def offer(v: Long, c: Int): Unit = {
      levels(0) += v
      if (levels(0).length >= c) compactFrom(0, c)
    }

    /** Compact level l into l+1: sort, keep odd indices at doubled
      * weight, add the level's weight to the error budget; cascade if
      * the target fills. A halving of weight-w items moves any rank by
      * at most w (each kept item absorbs its dropped neighbor).
      */
    private def compactFrom(l: Int, c: Int): Unit = {
      var lev = l
      while (lev < levels.length && levels(lev).length >= c) {
        val sorted = levels(lev).sorted
        levels(lev) = new scala.collection.mutable.ArrayBuffer[Long]
        if (lev + 1 >= levels.length)
          levels = levels :+ new scala.collection.mutable.ArrayBuffer[Long]
        var i = 1
        while (i < sorted.length) { levels(lev + 1) += sorted(i); i += 2 }
        // an odd straggler (possible after merge) stays at this level —
        // dropping it would lose its full weight from every rank
        if (sorted.length % 2 == 1) levels(lev) += sorted(0)
        err += (1L << lev)
        lev += 1
      }
    }

    def absorb(b: QsBuffer, c: Int): Unit = {
      var l = 0
      while (l < b.levels.length) {
        if (l >= levels.length)
          levels = levels :+ new scala.collection.mutable.ArrayBuffer[Long]
        levels(l) ++= b.levels(l)
        l += 1
      }
      err += b.err
      var lev = 0
      while (lev < levels.length) { // cascade any overfull level once
        if (levels(lev).length >= c) compactFrom(lev, c)
        lev += 1
      }
    }

    def allItems: Seq[(Long, Long)] =
      levels.toSeq.zipWithIndex.flatMap { case (lv, l) => lv.map(v => (v, 1L << l)) }

    def toBytes: Array[Byte] = {
      val n = levels.map(_.length).sum
      val bb = ByteBuffer.allocate(8 + 4 + levels.length * 4 + n * 8)
      bb.putLong(err)
      bb.putInt(levels.length)
      levels.foreach { lv =>
        bb.putInt(lv.length)
        lv.foreach(bb.putLong)
      }
      bb.array()
    }
  }

  object QsBuffer {
    def fromBytes(bytes: Array[Byte]): QsBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new QsBuffer
      buf.err = bb.getLong
      val nLevels = bb.getInt
      buf.levels = Array.fill(nLevels) {
        val n = bb.getInt
        val lv = new scala.collection.mutable.ArrayBuffer[Long](n)
        var i = 0
        while (i < n) { lv += bb.getLong; i += 1 }
        lv
      }
      buf
    }
  }

  /** `quantileSketch(value, c)` as an aggregate Column for `agg(...)`. */
  def quantileSketch(v: Column, c: Int): Column =
    ColumnBridge.column(
      QuantileSketchExpression(ColumnBridge.expression(v), c).toAggregateExpression())
}
