package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-shingle Karp–Rabin hashes: for a token array, the KR
  * fingerprint ([[KrHashExpression]] semantics — lowercase, keep
  * `[a-z0-9 ]`, fold `acc*31+code mod 1e9+7`) of every `n`-token
  * shingle "tok_i … tok_{i+n-1}" joined by single spaces, WITHOUT
  * materializing the shingle strings. The transform/concat_ws/explode
  * composition it replaces built millions of intermediate strings per
  * document batch and dominated the portable-minhash profile.
  *
  * Fewer than `n` tokens hash as one whole-array shingle — the same
  * degenerate-case rule as [[graft.operators.Dedup.shingles]].
  */
case class KrShingleHashExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_kr_shingle_hash requires (array<string>, int literal)")
    }

  override def nullSafeEval(tokens: Any, n: Any): Any =
    KrShingleHashExpression.compute(tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.KrShingleHashExpression.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KrShingleHashExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_kr_shingle_hash"
}

object KrShingleHashExpression {

  private val P = 1000000007L

  private def step(acc: Long, code: Int): Long = (acc * 31L + code) % P

  /** Fold one token's normalized codepoints into the hash. */
  private[functions] def foldToken(acc0: Long, s: UTF8String): Long = {
    if (s == null) return acc0
    val str = s.toString
    var acc = acc0
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      val lo = Character.toLowerCase(cp)
      if ((lo >= 'a' && lo <= 'z') || (lo >= '0' && lo <= '9') || lo == ' ')
        acc = step(acc, lo)
      i += Character.charCount(cp)
    }
    acc
  }

  /** One-pass kernel (called from eval and codegen). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val L = tokens.numElements()
    if (L < n) {
      var acc = 0L
      var j = 0
      while (j < L) {
        if (j > 0) acc = step(acc, ' ')
        acc = foldToken(acc, if (tokens.isNullAt(j)) null else tokens.getUTF8String(j))
        j += 1
      }
      new GenericArrayData(Array(acc))
    } else {
      val out = new Array[Long](L - n + 1)
      var i = 0
      while (i <= L - n) {
        var acc = 0L
        var j = i
        while (j < i + n) {
          if (j > i) acc = step(acc, ' ')
          acc = foldToken(acc, if (tokens.isNullAt(j)) null else tokens.getUTF8String(j))
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def krShingleHash(tokens: Column, n: Int): Column =
    ColumnBridge.column(KrShingleHashExpression(
      ColumnBridge.expression(tokens), Literal(n)))

  /** Register `graft_kr_shingle_hash` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kr_shingle_hash",
      exprs => KrShingleHashExpression(exprs.head, exprs(1)), "scala_udf")
}

/** One-pass portable SimHash over a token array: per-token Karp–Rabin
  * hash ([[KrShingleHashExpression.foldToken]] — lowercase, keep
  * `[a-z0-9 ]`, fold `acc*31+code mod 1e9+7`), a Knuth multiplicative
  * de-bias mix `h' = (h·2654435761) mod 2^30`, a ±1 vote per bit of
  * `h'` over the token multiset, sign → bit.
  *
  * The mix is load-bearing, not cosmetic: `acc*31+code mod 1e9+7`
  * never wraps for tokens under ~6 chars — most English tokens — so
  * raw per-token hashes are SMALL and the high hash bits are almost
  * always 0. Voting on the raw bits drove signature bits ≈18–29 to 0
  * for essentially every document, which collapsed the high LSH bands
  * into one bucket and degenerated the banded self-join to O(n²)
  * (measured: 16 245 pairs from ~500 docs at sf0.01 where the 64-bit
  * twin finds ~2 k; 13.7 s at sf0.1 — 23 % of the whole bench).
  * Multiplying by an odd constant mod 2^30 is a bijection that spreads
  * low-bit entropy across all 30 bits, and `h·2654435761 < 2^62` stays
  * exact in any ANSI-SQL BIGINT, so every oracle reproduces it.
  *
  * One codegen'd pass (same `doGenCode`-to-static-kernel pattern as
  * [[SimHash64Expression]]); `bits` ≤ 30 (the mix's modulus), checked
  * at analysis time since the literal is foldable.
  */
case class KrSimHashExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        right.eval() match {
          case b: java.lang.Integer if b >= 1 && b <= 30 =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          case b =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"graft_kr_simhash bits must be an int literal in [1,30], got $b")
        }
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_kr_simhash requires (array<string>, int literal)")
    }

  override def nullSafeEval(tokens: Any, bits: Any): Any =
    KrSimHashExpression.compute(tokens.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) =>
      s"${ev.value} = graft.functions.KrSimHashExpression.compute($t, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KrSimHashExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_kr_simhash"
}

object KrSimHashExpression {

  /** Knuth's multiplicative constant (⌊2^32/φ⌋, odd). */
  val MixMultiplier = 2654435761L

  /** De-bias modulus: 2^30 (KR hashes are < 1e9+7 < 2^30). */
  val MixModulus = 1L << 30

  /** One pass over the tokens; `bits` running vote counters over the
    * MIXED hash `(h·2654435761) mod 2^30` — see the class doc for why
    * voting on the raw KR hash degenerates the high bits. A null token
    * hashes to 0 (the KR hash of the empty string), matching the
    * [[KrShingleHashExpression]] n=1 path it replaces. `bits` is
    * validated at analysis time (checkInputDataTypes), not per row.
    */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val counters = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = KrShingleHashExpression.foldToken(
        0L, if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)) *
        MixMultiplier % MixModulus
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def krSimHash(tokens: Column, bits: Int): Column =
    ColumnBridge.column(KrSimHashExpression(
      ColumnBridge.expression(tokens), Literal(bits)))

  /** Register `graft_kr_simhash(tokens, bits)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kr_simhash",
      exprs => KrSimHashExpression(exprs.head, exprs(1)), "scala_udf")
}
