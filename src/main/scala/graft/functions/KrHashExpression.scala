package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused Karp–Rabin fingerprint: normalize (lowercase, keep
  * `[a-z0-9 ]`) and fold `acc*31 + code (mod 1e9+7)` in ONE pass over
  * the string — no regex pass, no per-char array, no boxed lambda.
  *
  * Replaces the `aggregate(filter(split(regexp_replace(lower(text)…`
  * composition in [[graft.operators.TextAnalysis.rollingHash]], which
  * allocates a boxed char array per row and dominated the portable-
  * minhash profile (one hash per shingle: millions of rows per
  * document batch). Bit-compatible with the composition — the
  * normalized alphabet is pure ASCII, where `Character.toLowerCase`
  * agrees with Spark's `lower` for every codepoint whose lowercase
  * lands in the kept set — and spec-checked against it.
  */
case class KrHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kr_hash requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    KrHashExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KrHashExpression.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): KrHashExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_kr_hash"
}

object KrHashExpression {

  private val P = 1000000007L

  /** One-pass normalize+fold kernel (called from eval and codegen). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      val lo = Character.toLowerCase(cp)
      if ((lo >= 'a' && lo <= 'z') || (lo >= '0' && lo <= '9') || lo == ' ') {
        acc = (acc * 31L + lo) % P
      }
      i += Character.charCount(cp)
    }
    acc
  }

  def krHash(c: Column): Column =
    ColumnBridge.column(KrHashExpression(ColumnBridge.expression(c)))

  /** Register `graft_kr_hash` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kr_hash", exprs => KrHashExpression(exprs.head), "scala_udf")
}
