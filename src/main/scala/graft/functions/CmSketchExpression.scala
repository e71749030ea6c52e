package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count–min sketch (Cormode–Muthukrishnan) as a bounded-state Catalyst
  * aggregate — the POINT-QUERY complement to the family's other two
  * sketches: KMV answers "how many distinct", Misra–Gries answers
  * "which terms are heavy", count–min answers "how often did THIS term
  * occur" for any term asked after the fact, in `d·w` counters per
  * group no matter the term cardinality. Estimates only ever
  * OVER-count (`true ≤ est ≤ true + εN` with ε ≈ e/w at the usual
  * depth), so a downstream filter keyed on "seen more than t times"
  * has one-sided error — the property de-duplication and
  * contamination screens rely on.
  *
  * State is a flat `d × w` long matrix; update touches d cells, merge
  * is element-wise addition — exactly mergeable, so map-side partials
  * collapse each partition's token stream to one matrix before the
  * single shuffle (O(d·w·groups) traffic at 100 TB), and per-shard
  * sketches reduce associatively like the KMV arrays.
  *
  * Portability is the house rule: the input is the Karp–Rabin fold
  * `hv ∈ [0, 1e9+7)` ([[KrHashExpression]]) and row `j`'s column is
  * the SAME affine family the portable minhash signatures permute
  * with — `((2j+3)·hv + 97j+1) mod 1e9+7 mod w` — so an ANSI engine
  * replays the ENTIRE counter matrix, collisions included: the gate's
  * DuckDB oracle reproduces the sketch's approximate answers
  * bit-for-bit, not just an exact-regime special case.
  *
  * Output is the raw `array<bigint>` matrix (row-major, length d·w),
  * not an estimate: callers point-query it with codegen'd arithmetic
  * ([[graft.operators.Sketches.cmEstimate]]) and may merge matrices
  * with `zip_with(+)`.
  */
case class CmSketchExpression(
    hv: Expression,
    weight: Expression,
    w: Int,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(w >= 2, s"count-min width must be >= 2, got $w")
  require(d >= 1 && d <= 16, s"count-min depth must be in [1, 16], got $d")

  import CmSketchExpression.P

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (hv.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"count-min hash input must be BIGINT, got ${hv.dataType.catalogString}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"count-min weight must be BIGINT, got ${weight.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hv.eval(input)
    if (h != null) {
      val wt = weight.eval(input)
      if (wt != null) {
        val wl = wt.asInstanceOf[Long]
        // one-sided error is the sketch's contract; a negative weight
        // would let counters UNDER-count and silently void it
        if (wl < 0) throw new IllegalArgumentException(
          s"count-min weight must be non-negative, got $wl")
        if (wl > 0) {
          val hl = ((h.asInstanceOf[Long] % P) + P) % P
          var j = 0
          while (j < d) {
            buf(j * w + (((2L * j + 3L) * hl + (97L * j + 1L)) % P % w).toInt) += wl
            j += 1
          }
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](d * w)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hv, weight)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmSketchExpression =
    copy(hv = newChildren(0), weight = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchExpression =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_cm_sketch"
}

object CmSketchExpression {

  /** The Karp–Rabin modulus — the hash space the affine row functions
    * permute, shared with the portable minhash signature family.
    */
  val P = 1000000007L

  /** `cmSketch(hv, weight, w, d)` — count-min aggregate Column over
    * pre-hashed terms; pass `lit(1L)` for unit counts.
    */
  def cmSketch(hv: Column, weight: Column, w: Int, d: Int): Column =
    ColumnBridge.column(
      CmSketchExpression(
        ColumnBridge.expression(hv),
        ColumnBridge.expression(weight.cast(LongType)),
        w, d).toAggregateExpression())
}
