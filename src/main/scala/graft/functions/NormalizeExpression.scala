package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the pass a
  * web-crawl pipeline runs BEFORE fingerprinting/dedup/tokenization, so
  * composed vs decomposed variants of the same text (é as U+00E9 vs
  * e + U+0301) stop fingerprinting as distinct documents through
  * [[graft.operators.Dedup.exact]], MinHash, and the rolling-hash chain
  * alike (reference behavior anchor: char-preserving row transport,
  * readme.md:63-66 — the reference moves bytes verbatim and leaves
  * normalization to the destination charset; a training-data pipeline
  * must instead normalize explicitly before content-addressed dedup).
  *
  * Three modes:
  *  - `NFC`   — canonical composition (java.text.Normalizer), the
  *    conservative default; oracle-matched to DuckDB's `nfc_normalize`.
  *  - `NFKC`  — compatibility composition (ﬁ → fi, fullwidth → ASCII,
  *    ² → 2); lossy by design, for fingerprint/dedup keys rather than
  *    stored text.
  *  - `NFKC_FOLD` — NFKC, then lowercase (full case fold via
  *    `Character.toLowerCase` per codepoint) and default-ignorable
  *    stripping (ZWSP/ZWJ/ZWNJ/soft hyphen/BOM and the other
  *    format-class invisibles). An ICU-free approximation of the
  *    UTS #39 confusable skeleton: it folds the case/width/invisible
  *    axes — the bulk of observed near-dup evasion — but does NOT map
  *    cross-script homoglyphs (Cyrillic а → Latin a needs ICU's
  *    confusables table, absent from the JDK).
  *
  * Codegen-true: `doGenCode` emits a direct static-kernel call, so the
  * pass rides whole-stage codegen like the other graft expressions.
  * The kernel fast-paths `Normalizer.isNormalized` (true for all-ASCII,
  * the overwhelming corpus majority) to skip allocation entirely.
  */
case class NormalizeExpression(child: Expression, form: String)
    extends UnaryExpression {

  NormalizeExpression.modeOf(form) // validate eagerly at construction

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_normalize requires string, got ${other.catalogString}")
    }

  private lazy val mode: Int = NormalizeExpression.modeOf(form)

  override def nullSafeEval(input: Any): Any =
    NormalizeExpression.compute(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeExpression.compute($c, $mode);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object NormalizeExpression {

  private val MODE_NFC = 0
  private val MODE_NFKC = 1
  private val MODE_NFKC_FOLD = 2

  private[graft] def modeOf(form: String): Int = form match {
    case "NFC"       => MODE_NFC
    case "NFKC"      => MODE_NFKC
    case "NFKC_FOLD" => MODE_NFKC_FOLD
    case other => throw new IllegalArgumentException(
      s"normalize form must be NFC | NFKC | NFKC_FOLD, got '$other'")
  }

  /** Is the codepoint an invisible format character that confusable
    * folding strips? Default-ignorables that survive NFKC: zero-width
    * space/joiner/non-joiner, word joiner, soft hyphen, BOM/ZWNBSP,
    * directional marks, and the Cf format class generally (which also
    * covers e.g. U+2064). Spaces themselves are NOT stripped — folding
    * normalizes rendering-invisible bytes, not tokenization.
    */
  private def isFoldIgnorable(cp: Int): Boolean =
    cp == 0x00AD || // soft hyphen (class Cf, listed for clarity)
      cp == 0xFEFF || // BOM / zero-width no-break space
      Character.getType(cp) == Character.FORMAT

  /** One-pass kernel (called from eval and codegen). */
  def compute(s: UTF8String, mode: Int): UTF8String = {
    val str = s.toString
    val form =
      if (mode == MODE_NFC) java.text.Normalizer.Form.NFC
      else java.text.Normalizer.Form.NFKC
    val normalized =
      if (java.text.Normalizer.isNormalized(str, form)) str
      else java.text.Normalizer.normalize(str, form)
    if (mode != MODE_NFKC_FOLD) {
      if (normalized eq str) s else UTF8String.fromString(normalized)
    } else {
      val sb = new java.lang.StringBuilder(normalized.length)
      var i = 0
      val n = normalized.length
      while (i < n) {
        val cp = normalized.codePointAt(i)
        if (!isFoldIgnorable(cp)) sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  def normalize(c: Column, form: String): Column =
    ColumnBridge.column(NormalizeExpression(ColumnBridge.expression(c), form))

  /** Register `graft_normalize(text, form)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize",
      exprs => {
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_normalize form must be a string literal, got $other")
        }
        NormalizeExpression(exprs.head, form)
      },
      "scala_udf")
}
