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

/** Native word-n-gram shingling with 64-bit hashed output — one pass
  * over the token array producing `array<long>` of DISTINCT shingle
  * hashes (first-occurrence order).
  *
  * Why: building shingles as strings from built-ins
  * (`transform`+`slice`+`array_join`+`array_distinct`) costs ~1 ms per
  * document — it allocates O(tokens) intermediate arrays and strings —
  * and everything downstream (Jaccard set ops, min-shingle block keys,
  * MinHash) only ever consumes the shingles through equality, so a
  * collision-free 64-bit hash is a drop-in representation: `array<long>`
  * set operations are an order of magnitude cheaper than
  * `array<string>` ones, and nothing re-hashes string bytes later.
  * Collision risk at 64 bits is ~1e-9 for millions of shingle
  * comparisons — below any realistic dedup noise floor.
  *
  * Hash = XXH64 (seed 42) over the UTF-8 bytes of the n tokens joined
  * with a single 0x20 separator — byte-identical to
  * `xxhash64(array_join(slice(...), ' '))` on the string form, so the
  * two representations stay interchangeable. If the array has fewer
  * than n tokens the whole array is one shingle (same fallback as the
  * string form).
  */
case class ShingleHash64Expression(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shinglehash64 requires array<string> and n>0, got ${other.catalogString}, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64Expression.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash64Expression.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shinglehash64"
}

object ShingleHash64Expression {

  /** One pass, one reusable byte buffer; dedupe via a HashSet of longs. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val nTok = arr.numElements()
    val winLen = if (nTok < n) math.max(nTok, 1) else n
    val nOut = if (nTok < n) 1 else nTok - n + 1
    val seen = new java.util.HashSet[java.lang.Long](nOut * 2)
    val out = new Array[Long](nOut)
    var outLen = 0
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nOut) {
      // assemble "tok_i tok_{i+1} ... tok_{i+winLen-1}" bytes
      var need = math.max(0, winLen - 1)
      var j = 0
      while (j < winLen) {
        if (i + j < nTok && !arr.isNullAt(i + j)) need += arr.getUTF8String(i + j).numBytes()
        j += 1
      }
      if (buf.length < need) buf = new Array[Byte](math.max(need, buf.length * 2))
      var pos = 0
      j = 0
      while (j < winLen) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        if (i + j < nTok && !arr.isNullAt(i + j)) {
          val s = arr.getUTF8String(i + j)
          s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += s.numBytes()
        }
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen))
  }

  def shingleHash64(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHash64Expression(ColumnBridge.expression(tokens), n))
  }

  /** Register `graft_shinglehash64(tokens, n)` for SQL use (n must be a
    * foldable int literal).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shinglehash64",
      exprs => ShingleHash64Expression(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]),
      "scala_udf")
}

/** Native lexicographically-minimal word-n-gram shingle — one pass over
  * the token array, no shingle-array materialization. Byte-wise UTF-8
  * comparison, identical to Spark's `array_min` over the string shingle
  * array (and to an ANSI engine's `min` under binary collation), so it
  * is the oracle-stable blocking key for n-gram dedup at a fraction of
  * the cost of building every shingle string.
  */
case class MinShingleExpression(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minshingle requires array<string> and n>0, got ${other.catalogString}, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    MinShingleExpression.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinShingleExpression.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): MinShingleExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_minshingle"
}

object MinShingleExpression {

  def compute(arr: ArrayData, n: Int): UTF8String = {
    val nTok = arr.numElements()
    val winLen = if (nTok < n) math.max(nTok, 1) else n
    val nOut = if (nTok < n) 1 else nTok - n + 1
    var best: UTF8String = null
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nOut) {
      var cand = UTF8String.EMPTY_UTF8
      var j = 0
      while (j < winLen) {
        if (j > 0) cand = UTF8String.concat(cand, sep)
        if (i + j < nTok && !arr.isNullAt(i + j))
          cand = UTF8String.concat(cand, arr.getUTF8String(i + j))
        j += 1
      }
      if (best == null || cand.binaryCompare(best) < 0) best = cand
      i += 1
    }
    best
  }

  def minShingle(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinShingleExpression(ColumnBridge.expression(tokens), n))
  }

  /** Register `graft_minshingle(tokens, n)` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minshingle",
      exprs => MinShingleExpression(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]),
      "scala_udf")
}

/** Native k-element MinHash signature over a shingle array — one pass
  * over the array computing all k minima, versus k separate
  * `transform`+`array_min` traversals when composed from built-ins.
  * Codegen'd via a static kernel, same pattern as
  * [[SimHash64Expression]].
  *
  * Hash family: each shingle's UTF-8 bytes are XXH64-hashed ONCE (seed
  * 42); slot i then rehashes that 64-bit digest with `XXH64.hashLong`
  * seeded by i. String bytes are touched once per shingle instead of k
  * times — an O(len·k) → O(len + k) drop per shingle — while the k
  * derived hashes stay pairwise-independent enough for MinHash (the
  * standard one-hash + k-mix construction).
  */
case class MinHash64Expression(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires array<string>|array<long> and k>0, got ${other.catalogString}, k=$k")
    }

  private def fromHashes: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromHashes) MinHash64Expression.computeFromHashes(input.asInstanceOf[ArrayData], k)
    else MinHash64Expression.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (fromHashes)
        s"${ev.value} = graft.functions.MinHash64Expression.computeFromHashes($c, $k);"
      else
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
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Same signature from pre-hashed shingles ([[ShingleHash64Expression]]
    * output): the element already IS the seed-42 string digest, so
    * slot i = hashLong(element, i) — bit-identical to the string path.
    */
  def computeFromHashes(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
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
