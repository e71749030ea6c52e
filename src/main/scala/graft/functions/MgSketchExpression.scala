package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a bounded-state Catalyst
  * aggregate: each group's buffer holds at most `m` (term, count)
  * counters plus one scalar — the total decrement `err` — so update and
  * merge state is O(m) regardless of how many tokens flow through. At
  * 100 TB this is the shape that finds the top domains / tokens / URLs
  * without shuffling the full (group, term) cardinality: partial
  * (map-side) sketches of size m reduce associatively, so shuffle
  * traffic is O(m · groups) where an exact `groupBy(g, term).count`
  * shuffles every distinct pair (fine when the vocabulary is bounded —
  * that exact twin is [[graft.operators.TextAnalysis.topTermsPerGroup]]
  * — and hopeless when terms are unbounded, e.g. URLs).
  *
  * Deterministic guarantee carried IN the output instead of alongside
  * it: for every emitted (term, est), `est ≤ true ≤ est + err`, and any
  * term whose true frequency exceeds `err` (≤ N/(m+1), N = total count)
  * is guaranteed present. Merge is the Agarwal et al. "Mergeable
  * Summaries" reduction: add counts, then subtract the (m+1)-th largest
  * count from every counter and drop the non-positive — the subtracted
  * amount accumulates into `err`, keeping the certificate sound after
  * arbitrary re-partitioning. With m ≥ the group's true distinct-term
  * count no decrement ever fires, `err = 0`, and the sketch degrades to
  * exact counts — the regime the cross-engine oracle gate pins
  * (`q_sketch_mg_exact`); the approximation regime is spec-gated on the
  * certificate itself, which holds under any partitioning even though
  * the raw estimates do not.
  *
  * Output: `struct<err: bigint, items: array<struct<term, est>>>` with
  * items sorted est desc, term asc — deterministic whenever the counter
  * multiset is.
  */
case class MgSketchExpression(
    child: Expression,
    weight: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketchExpression.MgBuffer] {

  import MgSketchExpression.MgBuffer

  require(m >= 1, s"misra-gries sketch needs m >= 1 counters, got $m")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg sketch term must be STRING, got ${child.dataType.catalogString}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"mg sketch weight must be BIGINT, got ${weight.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val t = child.eval(input)
    if (t != null) {
      val w = weight.eval(input)
      if (w != null) {
        val wl = w.asInstanceOf[Long]
        // a negative weight would push counters BELOW true counts while
        // err stays 0 — silently voiding the est <= true <= est + err
        // certificate the whole output is read through
        if (wl < 0) throw new IllegalArgumentException(
          s"mg sketch weight must be non-negative, got $wl")
        // weight 0 contributes nothing, but offering it would occupy a
        // counter slot until the next trim — and an untrimmed survivor
        // would emit a spurious (term, est=0) row the exact-regime
        // oracle (every count >= 1) does not contain
        if (wl > 0) {
          buf.offer(t.asInstanceOf[UTF8String].toString, wl)
          buf.trim(m)
        }
      }
    }
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    a.absorb(b)
    a.trim(m)
    a
  }

  override def eval(buf: MgBuffer): Any = {
    val items = buf.sortedItems.map { case (term, est) =>
      InternalRow(UTF8String.fromString(term), est)
    }
    InternalRow(buf.err, new GenericArrayData(items.toArray[Any]))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(bytes)

  override def dataType: DataType = MgSketchExpression.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, weight)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgSketchExpression =
    copy(child = newChildren(0), weight = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchExpression =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_mg_sketch"
}

object MgSketchExpression {

  val OutType: StructType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Mutable sketch state: counters + accumulated decrement. */
  final class MgBuffer {
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var err: Long = 0L

    def offer(term: String, w: Long): Unit = {
      val prev = counts.get(term)
      counts.put(term, if (prev == null) w else prev + w)
      ()
    }

    def absorb(other: MgBuffer): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        offer(e.getKey, e.getValue)
      }
      err += other.err
    }

    /** If more than m counters, subtract the (m+1)-th largest count
      * from all and drop the non-positive; the subtraction joins `err`.
      * The UPDATE path hits this with size exactly m+1, where the
      * (m+1)-th largest IS the minimum — an O(m) scan, no allocation,
      * no sort (the sort ran per incoming unseen token on the map-side
      * hot path of exactly the unbounded-domain workloads the sketch
      * exists for); the sort survives only for the MERGE path, whose
      * combined size can exceed m+1 and which runs once per partition
      * pair, not per row.
      */
    def trim(m: Int): Unit = if (counts.size > m) {
      val cut =
        if (counts.size == m + 1) {
          var mn = Long.MaxValue
          val vit = counts.values().iterator()
          while (vit.hasNext) { val v = vit.next(); if (v < mn) mn = v }
          mn
        } else {
          val vals = new Array[Long](counts.size)
          var i = 0
          val vit = counts.values().iterator()
          while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
          java.util.Arrays.sort(vals)
          // (m+1)-th largest = index size-(m+1) of the ascending sort
          vals(vals.length - (m + 1))
        }
      err += cut
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
    }

    /** Counters sorted est desc, term asc (deterministic). */
    def sortedItems: Seq[(String, Long)] = {
      val b = Seq.newBuilder[(String, Long)]
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += ((e.getKey, e.getValue.longValue()))
      }
      b.result().sortBy { case (t, c) => (-c, t) }
    }

    def toBytes: Array[Byte] = {
      val entries = sortedItems
      var payload = 8 + 4
      entries.foreach { case (t, _) =>
        payload += 4 + t.getBytes(StandardCharsets.UTF_8).length + 8
      }
      val bb = ByteBuffer.allocate(payload)
      bb.putLong(err)
      bb.putInt(entries.size)
      entries.foreach { case (t, c) =>
        val tb = t.getBytes(StandardCharsets.UTF_8)
        bb.putInt(tb.length)
        bb.put(tb)
        bb.putLong(c)
      }
      bb.array()
    }
  }

  object MgBuffer {
    def fromBytes(bytes: Array[Byte]): MgBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new MgBuffer
      buf.err = bb.getLong
      val n = bb.getInt
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val tb = new Array[Byte](len)
        bb.get(tb)
        buf.counts.put(new String(tb, StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      buf
    }
  }

  /** `mgSketch(term, m)` — unit-weight heavy-hitters aggregate Column. */
  def mgSketch(term: Column, m: Int): Column =
    mgSketchWeighted(term, org.apache.spark.sql.functions.lit(1L), m)

  /** Weighted variant: each row contributes `weight` (long) to its term. */
  def mgSketchWeighted(term: Column, weight: Column, m: Int): Column =
    ColumnBridge.column(
      MgSketchExpression(
        ColumnBridge.expression(term),
        ColumnBridge.expression(weight.cast(LongType)),
        m).toAggregateExpression())
}
