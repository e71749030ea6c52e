package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a bounded-state
  * Catalyst aggregate: each group's buffer is the set of the k SMALLEST
  * DISTINCT hash values seen, so update AND merge state is O(k) no
  * matter how many rows flow through — the property that lets one
  * sketch a 100 TB corpus with a single shuffle and O(k · groups)
  * traffic, where `groupBy(g).agg(countDistinct(h))` would shuffle
  * every distinct (g, h) pair and a window-rank formulation would sort
  * them. Mergeability is exact: if each shard keeps its k smallest
  * distinct values, every one of the k smallest of the union is among
  * some shard's k smallest, so sketch(A) ⊎ sketch(B) = sketch(A ∪ B) —
  * per-shard sketches reduce associatively (the cross-engine
  * `q_sketch_kmv_merge` gate pins this).
  *
  * The buffer dedups (TreeSet), which `CollectTopK`'s priority queue
  * does not — duplicate hashes would corrupt the k-th-smallest order
  * statistic the estimator reads.
  *
  * Output is the sorted sketch itself (`array<bigint>`, ascending,
  * size ≤ k), not the estimate: callers derive the estimate with
  * codegen'd arithmetic ([[graft.operators.Sketches.kmvEstimate]]) and
  * can merge sketch arrays with built-ins.
  */
case class KmvSketchExpression(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchExpression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchExpression =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_kmv_sketch"
}

object KmvSketchExpression {

  /** `kmvSketch(hash, k)` as an aggregate Column for `agg(...)`. */
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchExpression(ColumnBridge.expression(c), k).toAggregateExpression())
}
