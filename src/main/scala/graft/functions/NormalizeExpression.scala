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
  *  - `CONFUSABLE_FOLD` — NFKC_FOLD plus the cross-script homoglyph
  *    axis: an ICU-free table of the high-frequency Cyrillic/Greek →
  *    Latin confusables (the UTS #39 intentional.txt subset — the
  *    letters whose glyphs are BY DESIGN identical to Latin in
  *    ordinary fonts) applied after the case fold, so "Раѕѕwоrd"
  *    typed in Cyrillic folds to the same key as "password". This is
  *    the dedup-evasion / benchmark-contamination vector NFKC_FOLD
  *    documents as its own gap. Coverage (post-fold lowercase forms;
  *    uppercase evasion reaches them through the fold): Cyrillic
  *    а е о р с у х ѕ і ј һ ԁ ԛ ԝ plus в к м н т (whose UPPERCASE
  *    В К М Н Т are the Latin lookalikes), Greek
  *    α β ε ζ η ι κ μ ν ο ρ τ υ χ (glyph-identical capitals
  *    Α Β Ε Ζ Η Ι Κ Μ Ν Ο Ρ Τ Υ Χ reach them through the fold),
  *    Armenian հ ո ս օ (Հ Ո Ս Օ ≈ h n u o — the next script an
  *    evasion-minded adversary moves to once Cyrillic folds),
  *    Cherokee (the syllabary's uppercase letters Ꭰ Ꭱ Ꭲ Ꭺ Ꭻ Ꭼ Ꮃ Ꮇ
  *    Ꮋ Ꮍ Ꮐ Ꮓ Ꮩ Ꮪ Ꮮ Ꮯ Ꮲ Ꮶ Ᏼ are glyph-identical to Latin capitals
  *    D R T A J E W M H Y G Z V S L C P K B; the case fold lands them
  *    on the U+AB70 small-letter block — and on U+13FC for ᏼ — which
  *    is where this table catches them), and the Cyrillic DIGIT
  *    lookalikes з ч б → 3 4 6 (З≈3, Ч≈4, б≈6 — the leetspeak-style
  *    evasion axis letters alone can't close). Latin text — letters
  *    AND digits — remains a fixed point: only non-Latin codepoints
  *    are ever remapped. Like NFKC_FOLD it is lossy by design — a
  *    fingerprint/dedup key, not stored text.
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
  private val MODE_CONFUSABLE_FOLD = 3

  private[graft] def modeOf(form: String): Int = form match {
    case "NFC"             => MODE_NFC
    case "NFKC"            => MODE_NFKC
    case "NFKC_FOLD"       => MODE_NFKC_FOLD
    case "CONFUSABLE_FOLD" => MODE_CONFUSABLE_FOLD
    case other => throw new IllegalArgumentException(
      s"normalize form must be NFC | NFKC | NFKC_FOLD | CONFUSABLE_FOLD, got '$other'")
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

  /** The cross-script homoglyph table — post-case-fold LOWERCASE
    * Cyrillic/Greek codepoints mapped to the Latin letter their glyph
    * (or their uppercase's glyph) is intentionally identical to, per
    * the public UTS #39 intentional-confusables list. Applied ONLY in
    * CONFUSABLE_FOLD, after NFKC + case fold, so uppercase evasion
    * (Сyrillic "СТОР") arrives here already folded to lowercase.
    * Identity on everything else — Latin text is a fixed point.
    */
  private[graft] def confusableFold(cp: Int): Int = (cp: @annotation.switch) match {
    // Cyrillic — lowercase glyph ≈ Latin lowercase
    case 0x0430 => 'a' // а
    case 0x0435 => 'e' // е
    case 0x043E => 'o' // о
    case 0x0440 => 'p' // р
    case 0x0441 => 'c' // с
    case 0x0443 => 'y' // у
    case 0x0445 => 'x' // х
    case 0x0455 => 's' // ѕ
    case 0x0456 => 'i' // і
    case 0x0458 => 'j' // ј
    case 0x04BB => 'h' // һ
    case 0x0501 => 'd' // ԁ
    case 0x051B => 'q' // ԛ
    case 0x051D => 'w' // ԝ
    // Cyrillic — UPPERCASE glyph ≈ Latin (В К М Н Т); the fold has
    // already lowercased, so the lowercase forms carry the mapping
    case 0x0432 => 'b' // в (В ≈ B)
    case 0x043A => 'k' // к (К ≈ K)
    case 0x043C => 'm' // м (М ≈ M)
    case 0x043D => 'h' // н (Н ≈ H)
    case 0x0442 => 't' // т (Т ≈ T)
    // Greek — capitals Α Β Ε Ζ Η Ι Κ Μ Ν Ο Ρ Τ Υ Χ are glyph-identical
    // to Latin; their folded lowercase forms carry the mapping (ο and ν
    // are also lowercase-confusable on their own)
    case 0x03B1 => 'a' // α
    case 0x03B2 => 'b' // β
    case 0x03B5 => 'e' // ε
    case 0x03B6 => 'z' // ζ
    case 0x03B7 => 'h' // η
    case 0x03B9 => 'i' // ι
    case 0x03BA => 'k' // κ
    case 0x03BC => 'm' // μ
    case 0x03BD => 'v' // ν
    case 0x03BF => 'o' // ο
    case 0x03C1 => 'p' // ρ
    case 0x03C4 => 't' // τ
    case 0x03C5 => 'y' // υ
    case 0x03C7 => 'x' // χ
    // Armenian — Հ Ո Ս Օ are glyph-identical to Latin h-family caps;
    // the fold has already lowercased, so the small letters carry it
    case 0x0570 => 'h' // հ (Հ ≈ H-shape lowercase h)
    case 0x0578 => 'n' // ո
    case 0x057D => 'u' // ս
    case 0x0585 => 'o' // օ
    // Cherokee — the UPPERCASE syllables are the Latin lookalikes
    // (Ꭰ≈D, Ꭺ≈A, Ᏼ≈B, …); Character.toLowerCase maps U+13A0–13EF onto
    // the U+AB70 small-letter block (offset +0x97D0) and U+13F0–13F5
    // onto U+13F8–13FD, so the folded codepoints below are where
    // uppercase evasion arrives (spec-pinned; DuckDB's lower() agrees)
    case 0xAB70 => 'd' // ꭰ (Ꭰ ≈ D)
    case 0xAB71 => 'r' // ꭱ (Ꭱ ≈ R)
    case 0xAB72 => 't' // ꭲ (Ꭲ ≈ T)
    case 0xAB7A => 'a' // ꭺ (Ꭺ ≈ A)
    case 0xAB7B => 'j' // ꭻ (Ꭻ ≈ J)
    case 0xAB7C => 'e' // ꭼ (Ꭼ ≈ E)
    case 0xAB83 => 'w' // ꮃ (Ꮃ ≈ W)
    case 0xAB87 => 'm' // ꮇ (Ꮇ ≈ M)
    case 0xAB8B => 'h' // ꮋ (Ꮋ ≈ H)
    case 0xAB8D => 'y' // ꮍ (Ꮍ ≈ Y)
    case 0xAB90 => 'g' // ꮐ (Ꮐ ≈ G)
    case 0xAB93 => 'z' // ꮓ (Ꮓ ≈ Z)
    case 0xABA9 => 'v' // ꮩ (Ꮩ ≈ V)
    case 0xABAA => 's' // ꮪ (Ꮪ ≈ S)
    case 0xABAE => 'l' // ꮮ (Ꮮ ≈ L)
    case 0xABAF => 'c' // ꮯ (Ꮯ ≈ C)
    case 0xABB2 => 'p' // ꮲ (Ꮲ ≈ P)
    case 0xABB6 => 'k' // ꮶ (Ꮶ ≈ K)
    case 0x13FC => 'b' // ᏼ (Ᏼ ≈ B; 13F0-13F5 lowercase in-block to 13F8-13FD)
    // Cyrillic digit lookalikes — З≈3, Ч≈4, б≈6; lowercase forms carry
    // the mapping post-fold. ASCII digits are already a fixed point, so
    // this stays 1:1 and Latin-invariant
    case 0x0437 => '3' // з (З ≈ 3)
    case 0x0447 => '4' // ч (Ч ≈ 4)
    case 0x0431 => '6' // б
    case other  => other
  }

  /** One-pass kernel (called from eval and codegen). */
  def compute(s: UTF8String, mode: Int): UTF8String = {
    val str = s.toString
    val form =
      if (mode == MODE_NFC) java.text.Normalizer.Form.NFC
      else java.text.Normalizer.Form.NFKC
    val normalized =
      if (java.text.Normalizer.isNormalized(str, form)) str
      else java.text.Normalizer.normalize(str, form)
    if (mode != MODE_NFKC_FOLD && mode != MODE_CONFUSABLE_FOLD) {
      if (normalized eq str) s else UTF8String.fromString(normalized)
    } else {
      val mapConfusables = mode == MODE_CONFUSABLE_FOLD
      val sb = new java.lang.StringBuilder(normalized.length)
      var i = 0
      val n = normalized.length
      while (i < n) {
        val cp = normalized.codePointAt(i)
        if (!isFoldIgnorable(cp)) {
          val lc = Character.toLowerCase(cp)
          sb.appendCodePoint(if (mapConfusables) confusableFold(lc) else lc)
        }
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
        // arity FIRST — exprs(1) on a one-argument call would throw a
        // bare IndexOutOfBoundsException instead of naming the signature
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_normalize expects (text, form), got ${exprs.length} argument(s)")
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
