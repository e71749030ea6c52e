package graft.operators

/** The Unicode-normalization-form stamp the text-index families carry —
  * the loud enforcement of the caller contract
  * [[graft.streaming.CorpusIngest.startCuratedIngest]] r18 could only
  * DOCUMENT: an index probed or appended with text normalized under a
  * different form than it was built from silently stops matching (a
  * normalized batch's shingles never equal un-normalized history's),
  * which is a zero-matches result, not an error. Stamping the form at
  * write and comparing at probe/append converts that silence into a
  * named refusal — the `_terms`-fingerprint pattern
  * ([[TextAnalysis.lexicalCosineAgainstIndex]]'s snapshot guard)
  * applied to the normalization axis.
  *
  * Where each family keeps the stamp:
  *  - MinHash signature index — `graft_norm_form` column metadata on
  *    `sig_0`, beside the existing `graft_minhash_n` shingle stamp
  *    ([[Dedup.writeMinhashIndex]]).
  *  - Bloom decontamination screen — a `norm_form` column in
  *    `<table>_stats` ([[Corpus.writeBloomIndex]]).
  *  - BM25 postings index — a `norm_form` column in `<table>_stats`
  *    ([[TextAnalysis.writeBm25Index]]); [[TextAnalysis.restampBm25Index]]
  *    preserves it.
  *
  * `"NONE"` (the default everywhere) means "built from raw,
  * un-normalized text" — it is a VALUE, not an absence: probing a
  * NONE-stamped index with an NFKC_FOLD batch refuses exactly like an
  * NFC/NFKC_FOLD mismatch, because that is the failure the r18
  * contract documented. A surface with NO stamp at all (built before
  * the stamp existed — metadata key or stats column absent) is
  * accepted as-is: the WARN path, documented here rather than guessed
  * about, since refusing would break every pre-stamp index on upgrade;
  * rebuild (or restamp) to opt legacy surfaces into enforcement.
  */
private[graft] object NormForm {

  /** The stamp meaning "raw text, no normalization applied". */
  val Default = "NONE"

  /** Validate a form NAME eagerly (a typo must fail at write/probe
    * call time, not as a never-matching stamp): `"NONE"` or one of
    * [[graft.functions.NormalizeExpression]]'s modes.
    */
  def validate(form: String): String = {
    if (form != Default) graft.functions.NormalizeExpression.modeOf(form)
    form
  }

  /** The named refusal: `stored = None` is a pre-stamp surface
    * (accepted — the documented warn path); a present stamp must equal
    * the caller's form exactly.
    */
  def check(stored: Option[String], passed: String, surface: String): Unit = {
    validate(passed)
    stored.filter(_ != passed).foreach { s =>
      throw new IllegalArgumentException(
        s"$surface was built from text normalized with form '$s' but this " +
          s"call passes normForm='$passed' — mismatched forms silently stop " +
          "matching (normalized shingles never equal un-normalized " +
          "history's), so the call refuses instead: normalize the batch " +
          "with the stored form, or rebuild the index under the new one")
    }
  }
}
