package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for large-scale training-data pipelines —
  * the stages that sit between raw documents and a training run:
  * deterministic sampling, dataset mixing, sequence packing, PII
  * redaction, corpus statistics. All are declarative single-window or
  * single-aggregate shapes: no UDFs, no driver-side loops, every one
  * holds at 100 TB because the only shuffles are the explicit
  * per-shard/per-stratum hash partitions.
  */
object Corpus {

  // ------------------------------------------------------------ sampling

  /** Knuth multiplicative hash of a numeric id onto [0, 2^32) — chosen
    * over xxhash64 deliberately: it is reproducible outside Spark, so
    * sampling decisions can be audited. Well-defined for the FULL
    * 64-bit id range: Long multiplication wraps mod 2^64, which
    * preserves the product mod 2^32, and `pmod` folds the wrapped sign
    * back — an ANSI-SQL audit query needs 128-bit arithmetic AND a
    * sign fold to say the same, because SQL `%` keeps the dividend's
    * sign: in DuckDB use
    * `((CAST(id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296)
    * % 4294967296` (the plain `%` form diverges for negative ids).
    * Uniformity is adequate for rate sampling; adversarial keys should
    * pre-hash.
    */
  def portableHash(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(4294967296L))

  /** fraction → integer keep-threshold, computed ONCE on the driver and
    * shipped as a literal: `round` here matches SQL `CAST(x AS BIGINT)`
    * rounding (half-away ties need 2^32·f exactly half-integral —
    * impossible for practical fractions), whereas a Spark-side
    * `.cast("long")` of the double product would TRUNCATE and disagree
    * with the audit SQL by one for any non-dyadic fraction.
    */
  private def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    math.round(fraction * 4294967296.0)
  }

  /** Deterministic uniform sample: keep a row iff its id hashes below
    * `fraction` of the hash space. Same input ⇒ same sample, any cluster
    * size, no RNG state — the property training-data lineage needs.
    * Narrow (filter-only): no shuffle at all.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(portableHash(col(idCol)) < lit(threshold(fraction)))

  /** Stratified deterministic sample: per-stratum keep-rates (e.g.
    * up-sample low-resource languages, down-sample boilerplate-heavy
    * sources). Strata absent from `fractions` keep `defaultFraction`.
    * Still filter-only — the rate lookup is a literal CASE chain of
    * precomputed integer thresholds, not a join (strata counts are
    * config-sized).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val cut = fractions.foldLeft(lit(threshold(defaultFraction))) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(threshold(f))).otherwise(acc)
    }
    df.filter(portableHash(col(idCol)) < cut)
  }

  /** Per-ROW probability sampling: keep a row iff its id-hash lands
    * below the row's OWN keep-probability (`ppmCol`, integer parts per
    * million, clamped to [0, 1e6]) — [[deterministicSample]] with the
    * rate computed from the data instead of configured per stratum.
    * This is importance-weighted corpus thinning: keep probability
    * proportional to a quality/fit score, so low-quality mass thins
    * smoothly instead of at a hard threshold, while the lottery stays
    * the auditable portable hash (same input ⇒ same sample on any
    * engine; no RNG state).
    *
    * The comparison is EXACT integer arithmetic with no rounding at
    * all: `hash·10^6 < ppm·2^32`, both sides < 2^52 — the audit SQL
    * states the identical inequality. Narrow (filter-only), zero
    * shuffles.
    */
  def probabilitySample(df: DataFrame, idCol: String, ppmCol: Column): DataFrame =
    df.filter(
      portableHash(col(idCol)) * lit(1000000L) <
        least(greatest(ppmCol.cast("long"), lit(0L)), lit(1000000L)) *
          lit(4294967296L))

  /** Quality-weighted sampling of a text corpus: each document keeps
    * with probability equal to its [[TextAnalysis.qualityScore]] (the
    * heuristic already micro-unit-quantized for cross-engine replay) —
    * the smooth alternative to a hard `score >= t` gate: borderline
    * documents survive in proportion instead of cliff-dropping, which
    * preserves distributional coverage while still down-weighting
    * junk. One codegen'd pass, no shuffle.
    */
  def qualityWeightedSample(df: DataFrame, idCol: String, textCol: String): DataFrame =
    probabilitySample(df, idCol,
      floor(TextAnalysis.qualityScore(col(textCol)) * lit(1e6) + lit(0.5))
        .cast("long"))

  /** Temperature-smoothed mixture sampling at α = 1/2: per-stratum keep
    * rate `√(c_min / c_g)`, so the SAMPLED mixture follows `√c_g` — the
    * square-root smoothing multilingual pretraining uses to lift
    * low-resource languages without duplicating rows (the subsample-only
    * realization of "sample language g ∝ c_g^α"; the smallest stratum
    * keeps everything, rate 1). α is FIXED at 1/2 on purpose: `sqrt`,
    * `/`, and `·10⁶` are all correctly-rounded IEEE-754 ops, identical
    * on any engine, so the micro-unit rate — and therefore the exact
    * sample membership — replays bit-for-bit in the audit SQL. A general
    * `pow(c, α)` has no such guarantee (libm-dependent), which would
    * make the sample engine-dependent; compose repeated calls for
    * α ∈ {1/4, 1/8, …} if ever needed.
    *
    * Scale shape: one partial-aggregated count per stratum (strata are
    * config-sized: languages, sources), a one-row min, and a BROADCAST
    * join of the rate table back onto the corpus — the corpus itself is
    * touched by exactly one filter pass, zero corpus-sized shuffles.
    * The lottery is [[probabilitySample]]'s exact-integer comparison on
    * the portable hash: deterministic, resumable, lineage-auditable.
    */
  def sqrtTemperatureSample(df: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cg"))
    val cmin = counts.agg(min(col("__cg")).as("__cmin"))
    // a NULL stratum is a stratum: groupBy keeps it (it rightly
    // participates in c_min), so the rate join must be null-safe too —
    // a plain equi-join would silently drop every null-stratum row
    val rates = counts.crossJoin(broadcast(cmin)).select(
      col(stratumCol).as("__stratum"),
      floor(sqrt(col("__cmin").cast("double") / col("__cg").cast("double")) *
        lit(1000000.0)).as("__ppm"))
    probabilitySample(
      df.join(broadcast(rates), col(stratumCol) <=> col("__stratum")),
      idCol, col("__ppm"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-group quota cap: deterministically keep at most `cap` rows per
    * group — the "domain cap" of web-corpus curation (no single site may
    * contribute more than N documents), also the shape for per-source or
    * per-license quotas. Which rows survive is a uniform reproducible
    * lottery: rank by the portable Knuth hash of the id (ties by id), so
    * the same corpus always keeps the same rows on any engine, and a
    * re-crawl that adds rows to a group displaces survivors only where
    * the new ids hash lower.
    *
    * Scale shape: ONE shuffle on the group key, then a per-group sort
    * bounded by group size. The hash rank is uniform, so a hot domain
    * costs one big reducer sort — at the 100 TB extreme, pre-filter
    * with an approximate per-group count and a widened hash threshold
    * before the exact window, leaving the sort O(cap) per group.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(portableHash(col(idCol)), col(idCol))
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__r")
  }

  /** Per-stratum quantile band filter: keep rows whose `lenCol` sits
    * inside the [lo, hi] percent-rank band of their stratum — the
    * "drop the degenerate tails" curation rule (truncated docs at the
    * low end, concatenation accidents at the high end), computed per
    * language/source so low-resource strata aren't judged by the
    * corpus-wide distribution.
    *
    * `percent_rank = (rank-1)/(n-1)` is a ratio of integers — exact in
    * double and identical on any engine, so the emitted `pr_fx` needs no
    * epsilon. Ties share a rank (SQL rank semantics), making membership
    * insensitive to intra-tie row order.
    *
    * Scale shape: ONE shuffle (the stratum-keyed window); each stratum
    * sorts locally on its reducer. A stratum too large for one reducer
    * would switch to the two-pass histogram/percentile-summary route —
    * at that point use [[corpusSketchStats]]'s GK quantiles to derive
    * the cutoffs and a plain filter.
    */
  def lengthBandFilter(
      df: DataFrame,
      stratumCol: String,
      lenCol: String,
      lo: Double,
      hi: Double
  ): DataFrame = {
    require(lo <= hi && lo >= 0.0 && hi <= 1.0, "band must be 0 <= lo <= hi <= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(lenCol))
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") >= lo && col("__pr") <= hi)
      .withColumn("pr_fx", floor(col("__pr") * lit(1e6) + lit(0.5)).cast("long"))
      .drop("__pr")
  }

  // ----------------------------------------------------------- packing

  /** Concat-and-split sequence packing: documents are laid end-to-end in
    * (shard, id) order and the token stream is cut into `budget`-sized
    * packs; each document is assigned the pack its FIRST token lands in
    * (GPT-style block packing — long documents simply span packs).
    *
    * One window per shard computes the running token total; the pack id
    * is `floor((cum - tokens) / budget)`. Partitioning by `shardCol`
    * keeps the window distributed — shards are independent training
    * streams, so no global order is needed (or wanted) at scale.
    *
    * @return input columns + `cum_tokens` (inclusive running total
    *         within the shard) + `pack_id` (0-based within the shard)
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      shardCol: String
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exact long division, not double FLOOR: (cum - tokens) is a
    // non-negative long, so integer `div` IS the floor — and unlike the
    // double path it cannot misassign a pack by one past 2^53 tokens
    // (SQL `/` on longs is double division in Spark, hence `div`)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        expr(s"(cum_tokens - `$tokensCol`) div ${budget}L"))
  }

  /** Context-window chunking: split each document's token stream into
    * overlapping windows of `chunkSize` tokens advancing by `stride`
    * (stride < chunkSize ⇒ the overlap long-context training uses so no
    * span is only ever seen cut in half). A narrow map — tokenize,
    * compute the chunk count arithmetically, `transform` + `explode` —
    * no shuffle at all; chunk rows inherit the parent's partitioning.
    * The last window is shorter when the stream doesn't divide evenly;
    * `stride <= chunkSize` guarantees every window is non-empty.
    *
    * @return (idCol, chunk_id, n_tokens, chunk_text), chunk_id 0-based
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val w = TextAnalysis.tokens(col(textCol))
    // nChunks = 1 + ceil(max(n - chunkSize, 0) / stride), in exact
    // integer arithmetic (shared with the SQL oracle)
    val extra = greatest(size(w) - lit(chunkSize), lit(0))
    // floor of a small-int double division is exact (gap 1/stride far
    // exceeds a double ulp at these magnitudes); Spark's `/` on longs
    // would be double division anyway, so make the floor explicit
    val nChunks = lit(1L) +
      floor((extra + lit(stride - 1)).cast("double") / lit(stride.toDouble)).cast("long")
    df.select(col(idCol), explode(transform(
        sequence(lit(0L), nChunks.cast("long") - 1),
        i => struct(i.as("chunk_id"),
          slice(w, (i * lit(stride.toLong) + 1).cast("int"), lit(chunkSize))
            .as("ck")))).as("c"))
      .select(col(idCol), col("c.chunk_id").as("chunk_id"),
        size(col("c.ck")).as("n_tokens"),
        array_join(col("c.ck"), " ").as("chunk_text"))
  }

  // ------------------------------------------------------------ mixing

  /** Weighted interleave of sources (dataset mixing): a source with
    * weight w contributes one document every 1/w positions, so the
    * merged stream converges to the requested mixture at every prefix —
    * the property curriculum/streaming training needs (a plain union
    * followed by shuffle loses prefix guarantees; a random shuffle loses
    * determinism).
    *
    * Emits `mix_pos` (= per-source rank / weight); consumers range-
    * partition or sort by (`mix_pos`, tie-breakers) — a distributed
    * range sort, NOT a single-partition window, which is why this
    * returns the key rather than a materialized global row number.
    */
  def weightedInterleave(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double]
  ): DataFrame = {
    require(weights.values.forall(_ > 0.0), "weights must be positive")
    val w = weights.foldLeft(lit(Double.NaN)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val rank = row_number().over(
      Window.partitionBy(col(sourceCol)).orderBy(col(idCol)))
    // unweighted sources drop BEFORE the window — the filter pushes to
    // the scan, so unmixed data never rides the per-source shuffle
    df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .withColumn("mix_pos", rank.cast("double") / w)
  }

  /** Benchmark decontamination (GPT-3 appendix-C style): flag corpus
    * documents sharing any exact n-token shingle with an evaluation
    * set. Shingles are lowercase token windows joined by single spaces,
    * deduplicated PER DOCUMENT with `array_distinct` before the explode
    * — so the corpus side never shuffles raw shingles; the only
    * shuffle is the per-doc hit count. The benchmark side is tiny by
    * nature (eval suites, not corpora) and broadcasts.
    *
    * @return (idCol, n_hits, contaminated); n_hits counts DISTINCT
    *         matching shingles per document
    */
  def decontaminationFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8
  ): DataFrame = {
    require(n > 0)
    val benchSh = benchmark
      .select(explode(wordShingles(col(benchTextCol), n)).as("__sh")).distinct()
    val hits = df.select(col(idCol), explode(wordShingles(col(textCol), n)).as("__sh"))
      .join(broadcast(benchSh), Seq("__sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    df.select(col(idCol)).join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Distinct word `n`-gram shingle strings of a text column; fewer
    * than `n` tokens ⇒ empty (decontamination ignores sub-shingle
    * docs — unlike [[Dedup.shingles]]' whole-text degenerate rule,
    * a 3-token doc cannot meaningfully overlap an 8-gram eval set).
    */
  private def wordShingles(textC: Column, n: Int): Column =
    // bindOnce: the token array is sliced inside the gram lambda —
    // inlined, the regex split would re-run once per GRAM of every
    // document (O(tokens²) split work per doc; no CSE inside HOFs)
    TextAnalysis.bindOnce(TextAnalysis.tokens(lower(textC)), w =>
      when(size(w) >= n,
        array_distinct(transform(sequence(lit(0), size(w) - n),
          i => array_join(slice(w, i + 1, lit(n)), " "))))
        .otherwise(array().cast("array<string>")))

  /** Fraction-overlap decontamination — the "n-gram overlap" family of
    * eval-contamination checks for LM training sets: a document is
    * contaminated when at least `thresholdPpm` parts-per-million of its
    * DISTINCT word n-grams also occur in the benchmark corpus. The
    * exact-match [[decontaminationFlags]] catches verbatim inclusion;
    * the fraction form catches partial or fragmented leakage while
    * tolerating the odd shared phrase.
    *
    * The ratio is integer ppm — `n_hits·10^6 div n_shingles` — so the
    * flag is exact on every engine; no float enters the decision.
    *
    * Scale shape (100 TB): document shingles explode once; the (small)
    * benchmark shingle set broadcasts into a semi-join; one doc-keyed
    * count. Linear, no self-join. Documents shorter than `n` tokens
    * have no shingles and are never flagged.
    */
  def overlapDecontaminationFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 5,
      thresholdPpm: Long = 200000L
  ): DataFrame = {
    require(n > 0 && thresholdPpm >= 0)
    // ONE pass over the exploded corpus: the left-outer broadcast join
    // tags benchmark hits, and a single doc-keyed aggregate produces
    // both the shingle count and the hit count — the corpus-wide
    // explode (the dominant cost at scale) is never repeated
    val docSh = df.select(col(idCol), explode(wordShingles(col(textCol), n)).as("__sh"))
    val benchSh = benchmark
      .select(explode(wordShingles(col(benchTextCol), n)).as("__sh")).distinct()
      .withColumn("__hit", lit(1))
    val perDoc = docSh
      .join(broadcast(benchSh), Seq("__sh"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hits"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("ratio_ppm",
        when(col("n_shingles") > 0, expr("n_hits * 1000000 div n_shingles"))
          .otherwise(lit(0L)))
      .withColumn("contaminated", col("ratio_ppm") >= thresholdPpm)
  }

  /** Balanced output sharding with per-shard integrity manifests — the
    * operational epilogue of a corpus build: rows land in `nShards`
    * deterministic hash shards (stable under re-runs AND under corpus
    * growth of other shards), and each shard row carries its row count
    * plus the portable per-column content fingerprints of
    * [[graft.verify.Comparator.portableChecksum]] for the named
    * `checksumCols`. The sums are additive, so shard manifests merge
    * to the whole-table checksum by plain addition — a consumer can
    * verify any subset of shards it downloaded, or the union, against
    * one published manifest.
    *
    * Scale shape (100 TB): one hash shuffle on the shard key (the same
    * exchange the sharded WRITE needs anyway — compute the manifest in
    * the same pass), `nShards` rows out. No skew risk: the Knuth mix
    * spreads ids uniformly regardless of id clustering.
    */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      checksumCols: Seq[String]
  ): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val unknown = checksumCols.filterNot(fields.contains)
    require(unknown.isEmpty,
      s"checksumCols not in schema: ${unknown.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    val aggs = checksumCols.flatMap { c =>
      graft.verify.Comparator.checksumAggs(c, fields(c))
    }
    df
      .withColumn("shard", pmod(portableHash(col(idCol)), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  // --------------------------------------------------------- redaction

  /** PII redaction: emails, IPv4 addresses, then phone-like digit runs
    * replaced with typed placeholders. Pattern subset is deliberately
    * RE2-safe (no lookarounds, no backrefs) so the same patterns run on
    * any engine in the pipeline. Order matters: the IP pass runs before
    * the phone pass so dotted quads aren't half-eaten as phone numbers.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Unicode normalization — the pass that runs BEFORE fingerprint /
    * dedup / tokenize, so composed vs decomposed variants of the same
    * text (é as U+00E9 vs e+U+0301) stop counting as distinct documents
    * through [[Dedup.exact]], MinHash, and the rolling-hash chain.
    * `form`: `NFC` (canonical, content-preserving — the storage-safe
    * default), `NFKC` (compatibility: ﬁ→fi, fullwidth→ASCII — for
    * fingerprint keys), `NFKC_FOLD` (NFKC + case fold + invisible
    * format-char strip — the ICU-free confusable-skeleton approximation),
    * `CONFUSABLE_FOLD` (NFKC_FOLD + the high-frequency Cyrillic/Greek →
    * Latin homoglyph table, closing the cross-script evasion axis; see
    * [[graft.functions.NormalizeExpression]] for exact coverage).
    * Codegen'd native expression, zero shuffles.
    */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    graft.functions.NormalizeExpression.normalize(text, form)

  /** C4-style structural line filter (Raffel et al. 2020 §2.2's
    * best-known rules, the ones that are pure line-shape tests): keep
    * a line only if it (a) carries at least `minWords` whitespace
    * tokens AND (b) ends in terminal punctuation (`. ! ? "` — the
    * "looks like a sentence" test that drops nav menus, button labels,
    * and list fragments), then reassemble the survivors in order.
    * Returns (kept text, lines before, lines after) as a struct-shaped
    * projection via [[c4LineStats]] columns, or use this column alone
    * for the text. One codegen'd array pipeline — split, filter with a
    * lambda, rejoin — no explode, no shuffle, replayable in ANSI SQL
    * (the gate's twin applies the identical rules with list_filter).
    * Single-line fixture docs pass through iff they pass the rules —
    * the filter is line-shape-driven, never a whole-doc bypass.
    */
  def c4LineFilter(text: Column, minWords: Int = 3): Column = {
    require(minWords >= 1, "minWords must be >= 1")
    // split on \r?\n, not \n: CRLF crawl text would otherwise keep a
    // trailing \r on every line, which Spark's trim (spaces only)
    // doesn't strip and which makes Java's non-MULTILINE `$` diverge
    // from RE2's end-of-text `$` — the twin mirrors the same \r?\n
    array_join(filter(split(text, "\r?\n"), l =>
      size(filter(split(trim(l), "[ \t]+"), t => length(t) > 0)) >= minWords &&
        trim(l).rlike("[.!?\"]$")), "\n")
  }

  /** Line accounting for [[c4LineFilter]]: (lines_in, lines_kept) —
    * the per-document evidence a cleaning audit wants next to the
    * filtered text. Empty text counts zero lines in and zero kept.
    */
  def c4LineStats(text: Column, minWords: Int = 3): Column = {
    require(minWords >= 1, "minWords must be >= 1")
    val lines = split(text, "\r?\n")
    val kept = filter(lines, l =>
      size(filter(split(trim(l), "[ \t]+"), t => length(t) > 0)) >= minWords &&
        trim(l).rlike("[.!?\"]$"))
    struct(
      when(length(text) > 0, size(lines).cast("long")).otherwise(lit(0L))
        .as("lines_in"),
      when(length(text) > 0, size(kept).cast("long")).otherwise(lit(0L))
        .as("lines_kept"))
  }

  // ------------------------------------------------- URL canonicalization

  /** Query parameters a web-corpus canonicalizer drops — the
    * click-tracking decorations that make one page look like many URLs
    * (the #1 source of spurious URL-level "uniqueness" in crawl data).
    * Anchored partial-match regex over a single `k=v` token.
    */
  private val TrackingParamRe =
    "^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)(=|$)"

  /** Canonicalize an absolute http(s) URL for URL-level dedup and
    * domain accounting, the standard crawl-pipeline normalizations —
    * each one a pure codegen'd string expression, so the whole chain
    * replays in ANSI SQL (the gate's oracle applies the identical
    * regexes):
    *
    *  1. drop the fragment (`#…` — client-side only);
    *  2. strip RFC-3986 userinfo (`user:pass@` — credentials are not
    *     page identity, and lowercasing them would be wrong anyway:
    *     userinfo is case-sensitive), then lowercase the remaining
    *     `scheme://host[:port]` part (case-insensitive by RFC 3986)
    *     while leaving path and query case alone;
    *  3. strip default ports (`:80` on http, `:443` on https);
    *  4. empty path becomes `/`;
    *  5. drop tracking parameters ([[TrackingParamRe]]) and sort the
    *     survivors byte-wise, so parameter order can't split a page's
    *     identity; an emptied query drops its `?`.
    *
    * Best-effort on non-absolute input: a string without
    * `scheme://host` passes through with only fragment/query handling.
    * Compose with [[graft.operators.Dedup.exact]] on the result for
    * URL-level dedup and with [[domainCap]] on [[urlHost]] for
    * per-site quotas.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val query = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag)))
      .otherwise(lit(""))
    // "scheme://host[:port]" — same regex the oracle uses (no
    // substring_index divergence risk across engines)
    val hostPart = regexp_extract(base, "^[^/]*//[^/]*", 0)
    val rawPath = base.substr(length(hostPart) + 1, length(base))
    val path = when(length(hostPart) > 0 && length(rawPath) === 0, lit("/"))
      .otherwise(rawPath)
    // drop userinfo BEFORE lowercasing (userinfo is case-sensitive;
    // the canonical form strips it entirely) — `[^/@]*` cannot cross
    // the authority's first `@`, which is the RFC-3986 delimiter
    val hostNoUser = regexp_replace(hostPart, "^([^/]*//)[^/@]*@", "$1")
    val hostCanon = regexp_replace(
      regexp_replace(lower(hostNoUser), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val kept = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRe)))
    concat(hostCanon, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** The bare lowercased host of an absolute URL (no scheme, port,
    * userinfo, path) — the grouping key for [[domainCap]]-style
    * per-site quotas and host-level corpus stats. Empty string for
    * non-absolute input.
    */
  def urlHost(url: Column): Column =
    regexp_extract(lower(substring_index(substring_index(url, "#", 1), "?", 1)),
      "^[a-z0-9+.-]+://(?:[^/@]*@)?([^/:@]+)", 1)

  // ------------------------------------------------- end-to-end prepare

  /** Thresholds for [[prepareTrainingData]]. */
  final case class PrepareConfig(
      minQuality: Double = 0.3,
      maxWordRep: Double = 0.3,
      sampleFraction: Double = 1.0,
      packBudget: Long = 2048L
  )

  /** The composed corpus-preparation pipeline — quality filter →
    * exact dedup (keep lowest id) → deterministic sample → sequence
    * packing — as ONE declarative plan: Catalyst sees the whole chain,
    * so column pruning reaches the scan and each stage's shuffle feeds
    * the next without materialization. Every stage is individually
    * oracle-gated; this operator is the proof they compose.
    *
    * @return (idCol, shardCol, n_tokens, cum_tokens, pack_id)
    */
  def prepareTrainingData(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      cfg: PrepareConfig = PrepareConfig()
  ): DataFrame = {
    val filtered = df
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("__wr", TextAnalysis.wordRepetitionRatio(col(textCol)))
      .filter(col("__q") >= cfg.minQuality && col("__wr") <= cfg.maxWordRep)
      .drop("__q", "__wr")
    val deduped = Dedup.exact(filtered, idCol, textCol)
    val sampled = deterministicSample(deduped, idCol, cfg.sampleFraction)
    val withTokens = sampled.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    packSequences(withTokens, idCol, "n_tokens", cfg.packBudget, shardCol)
      .select(col(idCol), col(shardCol), col("n_tokens"),
        col("cum_tokens"), col("pack_id"))
  }

  // --------------------------------------------------- statistical LM

  /** Bigram language-model quality score: fit token bigram statistics
    * over the WHOLE corpus (two hash aggregates), then score every
    * document by its mean add-one-smoothed conditional log-probability
    * `ln P(w_i | w_{i-1})` — the cheap statistical cousin of model-based
    * quality filtering: fluent text scores high, shuffled/boilerplate/
    * generated-gibberish text scores low, and the whole thing is three
    * joins and three aggregates that scale like any word-count job.
    *
    * Denominator convention: `c(w1,·)` counts w1 as a bigram LEFT
    * context and V is the distinct left-context count, so fit and score
    * read ONE exploded bigram table.
    *
    * Engine-exact (same scheme as [[TextAnalysis.charEntropy]]): each
    * `ln p` rounds to a fixed-point long before the per-document sum,
    * making the fold order-independent and absorbing cross-engine `ln`
    * ulp differences; counts and V are integers, so `p` itself is
    * bit-identical everywhere.
    *
    * @return (idCol, n_bigrams, mean_logprob) — documents with fewer
    *         than 2 tokens score 0.0 with n_bigrams = 0
    */
  def bigramLogProbScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextAnalysis.tokens(lower(col(textCol)))
    // adjacent pairs as a narrow map: zip the array with its own tail.
    // Persisted because fit (two aggregates) and score each consume it —
    // without the cache the tokenize+explode pass, the dominant cost at
    // corpus scale, runs three times. Lifetime: until the session drops
    // it (the result is lazy, so this method cannot unpersist); see
    // Dedup.minhashNearDupPairs for the same trade. persistOnce keeps
    // bench reps from re-registering the identical plan.
    val bigrams = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      df.select(col(idCol),
        explode(zip_with(
          slice(w, lit(1), greatest(size(w) - 1, lit(0))),
          slice(w, lit(2), greatest(size(w) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val biCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val leftCounts = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = leftCounts.agg(count(lit(1)).as("v"))
    val scored = bigrams
      .join(biCounts, Seq("w1", "w2"))
      .join(leftCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__p",
        (col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
      .withColumn("__term", TextAnalysis.fxLong(log(col("__p")) * lit(1e15)))
    // terms are ~|ln p|·1e15 each: a long sum overflows past ~9·10³
    // bigrams × |ln p| (ANSI Spark throws, DuckDB HUGEINT→BIGINT cast
    // errors) — accumulate in unbounded decimal like corpusStats
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__term").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("__sum"))
      .withColumn("mean_logprob",
        TextAnalysis.round6(col("__sum").cast("double") / (col("n_bigrams") * lit(1e15))))
      .drop("__sum")
    // docs too short for any bigram still get a row
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("mean_logprob"), lit(0.0)).as("mean_logprob"))
  }

  /** Per-domain LM affinity (the CCNet/DoReMi-style domain-fit signal):
    * fit one add-one-smoothed bigram LM per domain AND one global LM in
    * the same pass, then score every document by the mean difference
    * `ln P_domain(w2|w1) − ln P_global(w2|w1)` under its OWN domain's
    * LM. Text that reads like its domain scores positive; misfiled or
    * boilerplate text scores negative — the cheap router for
    * domain-weighted sampling ([[stratifiedSample]] consumes it).
    *
    * Engine-exact like [[bigramLogProbScores]]: both `ln` terms round
    * to fixed point BEFORE the subtraction and the decimal sum, so the
    * fold is order-independent and the DuckDB oracle bit-matches. The
    * per-domain count tables add `domain` to every key — same shuffles,
    * K× the aggregate cardinality, which is exactly how it scales at
    * 100 TB (domains partition the corpus; no cross-domain traffic).
    *
    * @return (idCol, domainCol, n_bigrams, domain_fit); docs with fewer
    *         than 2 tokens get domain_fit 0.0 and n_bigrams 0
    */
  def domainAffinityScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String
  ): DataFrame = {
    val w = TextAnalysis.tokens(lower(col(textCol)))
    val bigrams = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      df.select(col(idCol), col(domainCol),
        explode(zip_with(
          slice(w, lit(1), greatest(size(w) - 1, lit(0))),
          slice(w, lit(2), greatest(size(w) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col(idCol), col(domainCol),
          col("bg.w1").as("w1"), col("bg.w2").as("w2")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dBi = bigrams.groupBy(domainCol, "w1", "w2").agg(count(lit(1)).as("cd12"))
    val dLeft = bigrams.groupBy(domainCol, "w1").agg(count(lit(1)).as("cd1"))
    val dV = dLeft.groupBy(domainCol).agg(count(lit(1)).as("vd"))
    val gBi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cg12"))
    val gLeft = bigrams.groupBy("w1").agg(count(lit(1)).as("cg1"))
    val gV = gLeft.agg(count(lit(1)).as("vg"))
    val lnD = log((col("cd12") + 1).cast("double") /
      (col("cd1") + col("vd")).cast("double"))
    val lnG = log((col("cg12") + 1).cast("double") /
      (col("cg1") + col("vg")).cast("double"))
    val perDoc = bigrams
      .join(dBi, Seq(domainCol, "w1", "w2"))
      .join(dLeft, Seq(domainCol, "w1"))
      .join(broadcast(dV), Seq(domainCol))
      .join(gBi, Seq("w1", "w2"))
      .join(gLeft, Seq("w1"))
      .crossJoin(broadcast(gV))
      .withColumn("__term",
        TextAnalysis.fxLong(lnD * lit(1e15)) - TextAnalysis.fxLong(lnG * lit(1e15)))
      .groupBy(col(idCol), col(domainCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__term").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("__sum"))
      .withColumn("domain_fit",
        TextAnalysis.round6(col("__sum").cast("double") / (col("n_bigrams") * lit(1e15))))
      .drop("__sum")
    df.select(col(idCol), col(domainCol)).join(perDoc, Seq(idCol, domainCol), "left_outer")
      .select(col(idCol), col(domainCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("domain_fit"), lit(0.0)).as("domain_fit"))
  }

  /** Trigram stupid-backoff LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation"): fit trigram/bigram/
    * unigram counts on a DETERMINISTIC held-in subset of the corpus
    * ([[portableHash]] < fitFraction — fitting on everything would make
    * backoff unreachable, since every scored trigram would be its own
    * evidence), then score every document by the mean log stupid-backoff
    * score of its trigrams:
    *
    *   S(w3|w1,w2) = c(w1w2w3)/c(w1w2·)        if the trigram was seen
    *               = 0.4 · c(w2w3)/c(w2·)      else if the bigram was
    *               = 0.4² · (c(w3)+1)/(N+V)    else (add-one unigram)
    *
    * Every probability is a ratio of integer counts evaluated in double
    * — bit-identical on any IEEE-754 engine — and each `ln S` rounds to
    * fixed point before the decimal per-document sum, so the oracle is
    * exact (same scheme as [[bigramLogProbScores]]).
    *
    * Scale shape: one tokenize+explode pass (persisted — five count
    * aggregates and the score join consume it), count tables shuffle on
    * their own grain, the scored stream joins them on broadcast-unfit
    * keys via ordinary hash shuffles. At trillion-token scale the count
    * tables would be min-count pruned first; kept exact here for the
    * oracle.
    *
    * @return (idCol, n_trigrams, mean_logprob); docs with fewer than 3
    *         tokens score 0.0 with n_trigrams = 0
    */
  def trigramBackoffScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      fitFraction: Double = 0.5,
      alpha: Double = 0.4
  ): DataFrame = {
    val w = TextAnalysis.tokens(lower(col(textCol)))
    val len = greatest(size(w) - 2, lit(0))
    val pairs = zip_with(slice(w, lit(1), len), slice(w, lit(2), len),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val tri = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      df.select(col(idCol),
        explode(zip_with(pairs, slice(w, lit(3), len),
          (ab, c) => struct(ab.getField("w1").as("w1"), ab.getField("w2").as("w2"),
            c.as("w3")))).as("tg"))
        .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
          col("tg.w3").as("w3")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fit = deterministicSample(tri, idCol, fitFraction)
    val c3 = fit.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val c2ctx = fit.groupBy("w1", "w2").agg(count(lit(1)).as("c2ctx"))
    val b3 = fit.groupBy("w2", "w3").agg(count(lit(1)).as("b3"))
    val b2ctx = fit.groupBy("w2").agg(count(lit(1)).as("b2ctx"))
    val uni = fit.groupBy("w3").agg(count(lit(1)).as("u"))
    val nv = fit.agg(count(lit(1)).as("n_fit"),
      countDistinct(col("w3")).as("v_fit"))
    // c3 > 0 implies c2ctx > 0 and b3 > 0 implies b2ctx > 0 (subset
    // counts), so the backoff CASE never divides by null
    val score = when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2ctx").cast("double"))
      .when(col("b3").isNotNull,
        lit(alpha) * col("b3").cast("double") / col("b2ctx").cast("double"))
      // greatest(…, 1): an empty fit set (possible on tiny corpora)
      // must not ANSI-fail the whole job with a division by zero
      .otherwise(lit(alpha * alpha) *
        (coalesce(col("u"), lit(0L)) + lit(1)).cast("double") /
        greatest(col("n_fit") + col("v_fit"), lit(1L)).cast("double"))
    val perDoc = tri
      .join(c3, Seq("w1", "w2", "w3"), "left_outer")
      .join(c2ctx, Seq("w1", "w2"), "left_outer")
      .join(b3, Seq("w2", "w3"), "left_outer")
      .join(b2ctx, Seq("w2"), "left_outer")
      .join(uni, Seq("w3"), "left_outer")
      .crossJoin(broadcast(nv))
      .withColumn("__term", TextAnalysis.fxLong(log(score) * lit(1e15)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("__term").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("__sum"))
      .withColumn("mean_logprob",
        TextAnalysis.round6(col("__sum").cast("double") / (col("n_trigrams") * lit(1e15))))
      .drop("__sum")
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("mean_logprob"), lit(0.0)).as("mean_logprob"))
  }

  /** Multinomial naive Bayes with add-one smoothing — the LEARNED
    * quality/domain gate beside the LM scorers (the CCNet-style
    * supervised classifier every corpus pipeline runs, fastText's
    * niche, in exact-arithmetic form): train per-class token counts on
    * a labeled stratum, score every document by integer micro-unit
    * log-likelihood, emit per-class scores and the argmax prediction.
    *
    *   score_fx(y) = fx(ln(d_y / D)) + Σ_w tf(w) · fx(ln((c_yw + 1) /
    *                 (N_y + V)))        with fx(x) = ⌊x·10⁶ + 0.5⌋
    *
    * d_y = class-y training docs, c_yw = class-y count of token w,
    * N_y = class-y token total, V = training vocabulary size. Tokens
    * unseen in class y — including tokens unseen in training entirely —
    * take the same smoothed (0+1)/(N_y+V) arm, so the model is total.
    * Every `ln` is evaluated on an exact integer ratio in double
    * (bit-identical on any IEEE-754 engine) and quantized to fixed
    * point BEFORE the tf multiply and the per-document sum — the
    * [[TextAnalysis]] cosineIdfFx discipline — so scores, and therefore
    * predictions, replay exactly in the DuckDB oracle. Ties break
    * toward the lexicographically smaller label (deterministic).
    *
    * Scale shape: training is two bounded hash aggregates over the
    * labeled stratum (class counts are config-sized, the (class, token)
    * table is vocabulary-sized and broadcast); scoring is one
    * tokenize+tf pass over the corpus cross-joined with the K class
    * rows (K is small — the token stream fans out K×, the standard
    * one-vs-all cost) and one left join against the (class, token)
    * counts. Zero corpus-sized shuffles beyond the per-doc tf
    * aggregate.
    *
    * @return one row per (document, class):
    *         (idCol, label, score_fx, pred) — `pred` marks the argmax
    *         row; zero-token documents score the prior alone
    */
  def naiveBayesClassScores(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String
  ): DataFrame = {
    val trainTok = nbToks(train, textCol, Seq(col(labelCol).as("__label")))
    nbScoreDocs(docs, idCol, textCol,
      trainTok.groupBy("__label", "__w").agg(count(lit(1)).as("__cyw")),
      trainTok.groupBy("__label").agg(count(lit(1)).as("__ny")),
      train.groupBy(col(labelCol).as("__label")).agg(count(lit(1)).as("__dy")))
  }

  private def nbToks(df: DataFrame, textCol: String, keep: Seq[Column]): DataFrame =
    df.select(keep :+ explode(TextAnalysis.tokens(lower(col(textCol)))).as("__w"): _*)
      .filter(length(col("__w")) > 0)

  /** The shared scoring tail of the naive-Bayes family — fed by
    * [[naiveBayesClassScores]] (counts computed inline) and
    * [[naiveBayesScoresFromModel]] (counts read from the persisted
    * model), so the two paths cannot diverge. V and D aggregate from
    * the count frames themselves (vocabulary-/K-sized — never the
    * corpus), which keeps a persisted model self-describing with no
    * stats row to go stale.
    */
  private def nbScoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cyw: DataFrame, // (__label, __w, __cyw)
      ny: DataFrame,  // (__label, __ny)
      dy: DataFrame   // (__label, __dy)
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = cyw.agg(countDistinct(col("__w")).as("__v"))
    val dTot = dy.agg(coalesce(sum(col("__dy")), lit(0L)).as("__d"))
    // K class rows: prior + the (N_y + V) smoothing denominator. dy is
    // the class spine (a zero-token class still classifies — every
    // token takes its smoothed zero arm)
    val classes = dy.join(ny, Seq("__label"), "left_outer")
      .crossJoin(broadcast(v)).crossJoin(broadcast(dTot))
      .select(
        col("__label"),
        TextAnalysis.fxLong(
          log(col("__dy").cast("double") / col("__d").cast("double")) * lit(1e6))
          .as("__prior_fx"),
        (coalesce(col("__ny"), lit(0L)) + col("__v")).as("__den"))
    val dtf = nbToks(docs, textCol, Seq(col(idCol)))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    val contrib = dtf
      .crossJoin(broadcast(classes))
      .join(cyw, Seq("__label", "__w"), "left_outer")
      .withColumn("__fx", TextAnalysis.fxLong(
        log((coalesce(col("__cyw"), lit(0L)) + 1).cast("double") /
          col("__den").cast("double")) * lit(1e6)))
      .groupBy(col(idCol), col("__label"), col("__prior_fx"))
      .agg(sum((col("__tf") * col("__fx")).cast(dec)).as("__sum"))
      .select(col(idCol), col("__label"),
        (col("__prior_fx") + col("__sum").cast("long")).as("score_fx"))
    // zero-token documents still get K rows: the prior alone
    val all = docs.select(col(idCol)).distinct()
      .crossJoin(broadcast(classes.select(col("__label"), col("__prior_fx"))))
      .join(contrib, Seq(idCol, "__label"), "left_outer")
      .select(col(idCol), col("__label").as("label"),
        coalesce(col("score_fx"), col("__prior_fx")).as("score_fx"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_fx").desc, col("label"))
    all.withColumn("pred", row_number().over(w) === 1)
  }

  /** Persist a trained naive-Bayes model — the train-once/score-many
    * shape of the index families applied to the classifier: `<table>`
    * holds the (label, w, cyw) token counts (vocabulary × K rows) and
    * `<table>_classes` the per-class (label, ny, dy) totals. V and D
    * are NOT stamped — [[naiveBayesScoresFromModel]] re-aggregates
    * them from the stored counts (vocabulary-sized, cheap), so the
    * model is self-describing with nothing to go stale. A model is a
    * derived artifact: to incorporate new labeled data, retrain —
    * counts are one bounded aggregate over the stratum.
    */
  def writeNaiveBayesModel(
      train: DataFrame,
      textCol: String,
      labelCol: String,
      tableName: String
  ): Unit = {
    val spark = train.sparkSession
    val trainTok = nbToks(train, textCol, Seq(col(labelCol).as("label")))
    trainTok.groupBy("label", "__w").agg(count(lit(1)).as("cyw"))
      .select(col("label"), col("__w").as("w"), col("cyw"))
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    val ny = trainTok.groupBy("label").agg(count(lit(1)).as("ny"))
    train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("dy"))
      .join(ny, Seq("label"), "left_outer")
      .select(col("label"), coalesce(col("ny"), lit(0L)).as("ny"), col("dy"))
      .write.mode("overwrite").format("parquet").saveAsTable(tableName + "_classes")
    spark.catalog.refreshTable(tableName)
    spark.catalog.refreshTable(tableName + "_classes")
  }

  /** Score documents against a PERSISTED naive-Bayes model
    * ([[writeNaiveBayesModel]]) — identical output contract to
    * [[naiveBayesClassScores]] by construction (both feed the same
    * scoring tail), but training never re-runs: an ingest epoch pays
    * one tf pass over the batch plus vocabulary-sized model reads.
    */
  def naiveBayesScoresFromModel(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      docs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val cls = spark.table(tableName + "_classes")
    nbScoreDocs(docs, idCol, textCol,
      spark.table(tableName).select(col("label").as("__label"),
        col("w").as("__w"), col("cyw").as("__cyw")),
      cls.select(col("label").as("__label"), col("ny").as("__ny")),
      cls.select(col("label").as("__label"), col("dy").as("__dy")))
  }

  // -------------------------------------------------------------- stats

  /** Per-group corpus statistics: document count, total/mean length and
    * the exact median. One hash-partitioned aggregate; sums accumulate
    * in DECIMAL so the result is engine-exact. Exact median sorts within
    * groups — for 100 TB dashboards swap in `percentile_approx`, kept
    * exact here so the result is oracle-checkable.
    */
  def corpusStats(df: DataFrame, groupCol: String, lenCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(lenCol).cast("long")).as("total_len"),
        // decimal-accumulate, ONE cast, then double division — decimal
        // division scale rules differ across engines, double's don't
        (sum(col(lenCol).cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double") / count(lit(1))).as("mean_len"),
        median(col(lenCol)).cast("double").as("median_len")
      )

  /** Sketch-based corpus diagnostics — the 100 TB path the exact
    * [[corpusStats]] deliberately isn't: per-group vocabulary size via
    * HyperLogLog++ (`approx_count_distinct`, mergeable partials — no
    * shuffle of token sets), token count, and approximate length
    * quantiles (Greenwald-Khanna, single pass). Cross-engine
    * hash-oracles don't apply to sketches; accuracy is spec-gated
    * against exact answers on fixtures instead (relative error bounds
    * from the sketch parameters: HLL rsd, GK accuracy).
    *
    * @param rsd HLL relative standard deviation (default 2.3%)
    */
  def corpusSketchStats(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      lenCol: String,
      rsd: Double = 0.023
  ): DataFrame = {
    val toks = df.select(col(groupCol),
      col(lenCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
    val vocab = toks.groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col("__tok"), rsd).as("approx_vocab"),
        count(lit(1)).as("n_tokens"))
    val quant = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(lenCol), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(10000)).as("__q"))
      .select(col(groupCol),
        col("__q").getItem(0).cast("double").as("p50_len"),
        col("__q").getItem(1).cast("double").as("p90_len"),
        col("__q").getItem(2).cast("double").as("p99_len"))
    vocab.join(quant, Seq(groupCol))
  }

  // ------------------------------------------------------------ splitting

  /** Deterministic train/val/test split: each row's [[portableHash]]
    * bucket decides its split, so the assignment is reproducible from
    * the id alone — any engine, any cluster size, no RNG state, and a
    * row never migrates between splits when the corpus grows (the
    * property eval-set hygiene needs). Narrow (projection-only).
    *
    * Cut points use the same driver-side `round` as [[threshold]] so a
    * SQL audit reproduces the buckets exactly.
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String,
      valFraction: Double,
      testFraction: Double = 0.0
  ): DataFrame = {
    require(valFraction >= 0 && testFraction >= 0 &&
      valFraction + testFraction <= 1.0, "fractions in [0,1], sum <= 1")
    val valCut = threshold(valFraction)
    val testCut = threshold(valFraction + testFraction)
    val h = portableHash(col(idCol))
    df.withColumn("split",
      when(h < valCut, lit("val"))
        .when(h < testCut, lit("test"))
        .otherwise(lit("train")))
  }

  /** Leakage-safe train/val/test split: [[deterministicSplit]] plus
    * near-dup hygiene. A val/test document whose near-duplicate sits in
    * a DIFFERENT split is contaminated — its "held-out" content is
    * effectively in the training set — so demotion works on whole
    * near-dup CLUSTERS ([[graft.operators.Dedup.duplicateClusters]]
    * over the exact-oracle
    * [[graft.operators.Dedup.portableMinhashPairs]]): any cluster
    * whose members straddle more than one split has every non-train
    * member demoted to train. Cluster-level (not pair-level) demotion
    * is what CLOSES the invariant — a pair-only pass demoting B out of
    * A~B~C would leave a fresh A(val)↔B(train) leak behind; after
    * cluster demotion no near-dup pair's ends ever sit in different
    * splits, chains included. Demotion (not dropping) keeps the corpus
    * intact: train absorbing a near-dup of itself is harmless, an eval
    * set silently shrunk by drops is not. Val↔test clusters demote
    * wholesale — held-out sets must not leak into each other either.
    *
    * Scale shape: the split is a per-row hash (no shuffle); the pair
    * list is the banded signature self-join, already bounded by the
    * MinHash machinery; connected components run over pair rows only
    * (≪ corpus, pointer-jumping label propagation); the demotion
    * roster is small and broadcasts back onto the corpus. Everything
    * is exact portable arithmetic — hash split, signatures, pairing,
    * transitive closure and demotion all replay in an ANSI-SQL twin
    * (recursive CTE for the closure).
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valFraction: Double,
      testFraction: Double = 0.0,
      n: Int = 3,
      kSig: Int = 8,
      simThreshold: Double = 0.5
  ): DataFrame = {
    val split = deterministicSplit(df, idCol, valFraction, testFraction)
    val pairs = graft.operators.Dedup
      .portableMinhashPairs(df, idCol, textCol, n, kSig, simThreshold)
    val clusters = graft.operators.Dedup.duplicateClusters(pairs)
    val assign = split.select(col(idCol), col("split"))
    val membered = clusters
      .join(assign.withColumnRenamed(idCol, "id"), "id")
    val mixed = membered.groupBy("cluster")
      .agg(count_distinct(col("split")).as("__nsplits"))
      .filter(col("__nsplits") > 1)
      .select("cluster")
    // no distinct: duplicateClusters emits exactly one row per id
    // (its labels are a groupBy(id) result) and `mixed` is one row per
    // cluster, so the roster is unique by construction — the distinct
    // was a redundant exchange+aggregate on the demotion path
    val demoted = membered.join(mixed, "cluster")
      .filter(col("split") =!= "train")
      .select(col("id").as(idCol))
      .withColumn("__demote", lit(true))
    split.join(demoted, Seq(idCol), "left")
      .withColumn("split",
        when(col("__demote"), lit("train")).otherwise(col("split")))
      .drop("__demote")
  }

  // ------------------------------------------------------------ shuffling

  /** Deterministic global shuffle for training order: sort by the salted
    * [[portableHash]] of the id (ties broken by id). A different `salt`
    * per epoch re-shuffles reproducibly with zero RNG state to
    * checkpoint. Spark's `orderBy` executes as a range-repartition +
    * per-partition sort — a distributed total order with no single-task
    * bottleneck (plan-gated in CorpusSpec), which is why this beats the
    * driver-side `shuffle()` a small-data pipeline would use.
    *
    * The salt mixes in by XOR, not addition: exact for EVERY (id, salt)
    * Long pair — `id + salt` could silently wrap for adversarial ids —
    * and just as portable (`xor(id, salt)` in any SQL engine with
    * bitwise ops; the audit form of [[portableHash]] then applies
    * unchanged). XOR by a constant is a bijection on ids, so each
    * epoch's key assignment is still a permutation of the hash space.
    */
  def epochShuffle(df: DataFrame, idCol: String, salt: Long = 0L): DataFrame =
    df.withColumn("shuffle_key", portableHash(col(idCol).bitwiseXOR(lit(salt))))
      .orderBy(col("shuffle_key"), col(idCol))

  // -------------------------------------------- bloom decontamination

  /** Bloom-filter decontamination: flags documents sharing any `n`-token
    * shingle with a benchmark set, via a portable Bloom filter instead
    * of the exact shingle join of [[decontaminationFlags]]. At 100 TB
    * the benchmark's *bit set* (`k` bits per shingle, `mBits` space) is
    * what broadcasts — bounded by `mBits/8` bytes no matter how many
    * eval suites feed it — and the corpus side never shuffles shingle
    * strings, only (id, hash-bit) longs.
    *
    * Every position is exact modular arithmetic over the Karp-Rabin
    * shingle hash ([[graft.functions.KrShingleHashExpression]]) and the
    * affine family `h*(2i+3) + 97i+1 mod mBits` — the same portable
    * construction as [[Dedup.portableMinhashSignatures]] — so a SQL
    * oracle reproduces the filter bit-for-bit, false positives included
    * (they are a deterministic function of the hash family, not
    * noise).
    *
    * @return (idCol, n_flagged — distinct shingles whose `k` bits are
    *         all set, flagged — n_flagged > 0)
    */
  def bloomDecontaminationFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      mBits: Int = 1 << 18,
      k: Int = 5
  ): DataFrame = {
    require(k >= 1 && k <= 16 && mBits > 0)
    val benchBits = benchmark
      .select(explode(bloomShingleHashes(col(benchTextCol), n)).as("__h"))
      .select(explode(bloomPositions(col("__h"), mBits, k)).as("__bit"))
      .distinct()
    bloomFlagsAgainstBits(df, idCol, textCol, benchBits, n, mBits, k)
  }

  private def bloomShingleHashes(textC: Column, n: Int): Column =
    array_distinct(graft.functions.KrShingleHashExpression
      .krShingleHash(TextAnalysis.tokens(lower(textC)), n))

  private def bloomPositions(h: Column, mBits: Int, k: Int): Column =
    array((0 until k).map(i =>
      (h * lit(2L * i + 3) + lit(97L * i + 1)) % mBits): _*)

  /** The shared query tail of [[bloomDecontaminationFlags]] and
    * [[bloomDecontaminationFromIndex]]: probe every corpus shingle's
    * `k` positions against the (broadcast) set-bit roster.
    */
  private def bloomFlagsAgainstBits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchBits: DataFrame,
      n: Int,
      mBits: Int,
      k: Int
  ): DataFrame = {
    // one row per (doc, shingle, probe); a shingle is flagged iff all k
    // probes hit set bits — duplicate positions count with multiplicity
    // on both sides of the oracle, so the comparison stays exact
    val probes = df
      .select(col(idCol), explode(bloomShingleHashes(col(textCol), n)).as("__h"))
      .select(col(idCol), col("__h"),
        explode(bloomPositions(col("__h"), mBits, k)).as("__bit"))
    val flaggedShingles = probes
      .join(broadcast(benchBits), Seq("__bit"))
      .groupBy(col(idCol), col("__h"))
      .agg(count(lit(1)).as("__nset"))
      .filter(col("__nset") === k)
    val perDoc = flaggedShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_flagged"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        (coalesce(col("n_flagged"), lit(0L)) > 0).as("flagged"))
  }

  // ------------------------------- materialized benchmark bloom index

  /** Persist the benchmark bit set as a catalog table — the SIXTH
    * materialized index family, for the artifact decontamination
    * actually reuses: eval suites change rarely, the corpus streams
    * past daily, so the `mBits`-bounded bit roster is built once and
    * every batch probes it. The table holds one `bit` row per SET
    * position (≤ `mBits` rows no matter how many suites feed it);
    * `<table>_stats` pins (m_bits, k_hashes, shingle_n) so every later
    * append and query runs the exact hash family the bits were built
    * with — parameters travel WITH the index, a mismatched query is
    * impossible by construction.
    *
    * Lifecycle: [[appendToBloomIndex]] unions a new suite's bits in
    * O(suite); appends are replay-idempotent because queries read the
    * roster through `distinct()` (the MinHash-index replay contract).
    * Small-file residue compacts via
    * `Compaction.rewriteTable(spark, table)(identity)` with `distinct`
    * applied here at read. A Bloom bit set cannot UNSET bits (positions
    * are shared across suites), so removing a benchmark = rebuild from
    * the remaining suites via [[writeBloomIndex]] — stated, not hidden;
    * [[bloomIndexStats]]' fill ratio is the staleness signal that says
    * when `mBits` itself needs to grow.
    */
  def writeBloomIndex(
      benchmark: DataFrame,
      benchTextCol: String,
      tableName: String,
      n: Int = 8,
      mBits: Int = 1 << 18,
      k: Int = 5,
      normForm: String = NormForm.Default
  ): Unit = {
    require(k >= 1 && k <= 16 && mBits > 0)
    NormForm.validate(normForm)
    val spark = benchmark.sparkSession
    import spark.implicits._
    benchmark
      .select(explode(bloomShingleHashes(col(benchTextCol), n)).as("__h"))
      .select(explode(bloomPositions(col("__h"), mBits, k)).as("bit"))
      .distinct()
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    // norm_form rides the stats row (see [[NormForm]]): probes and
    // appends must declare the same normalization the bits were built
    // from, or refuse named instead of silently never matching
    Seq((mBits, k, n, normForm))
      .toDF("m_bits", "k_hashes", "shingle_n", "norm_form")
      .write.mode("overwrite").format("parquet").saveAsTable(tableName + "_stats")
  }

  private def readBloomIndexParams(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): (Int, Int, Int) = {
    val r = spark.table(tableName + "_stats").collect()
    require(r.length == 1, s"${tableName}_stats must hold exactly one row")
    (r.head.getAs[Int]("shingle_n"), r.head.getAs[Int]("m_bits"),
      r.head.getAs[Int]("k_hashes")) // (n, mBits, k)
  }

  /** The stored normalization-form stamp of a bloom index, `"NONE"`
    * for an r19+ index built from raw text, [[scala.None]] for a
    * pre-stamp `_stats` row (no `norm_form` column) — the documented
    * accept-as-is path.
    */
  def bloomIndexNormForm(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): Option[String] = {
    val t = spark.table(tableName + "_stats")
    if (t.columns.contains("norm_form"))
      Some(t.select(col("norm_form")).head().getString(0))
    else None
  }

  /** Union a new eval suite's bits into the index — O(suite) work, the
    * stored hash-family parameters applied unconditionally. Duplicate
    * bit rows (overlap with existing suites, or a replayed append) are
    * harmless: queries distinct the roster.
    */
  def appendToBloomIndex(
      tableName: String,
      suite: DataFrame,
      benchTextCol: String,
      normForm: String = NormForm.Default
  ): Unit = {
    val spark = suite.sparkSession
    NormForm.check(bloomIndexNormForm(spark, tableName), normForm, tableName)
    val (n, mBits, k) = readBloomIndexParams(spark, tableName)
    suite
      .select(explode(bloomShingleHashes(col(benchTextCol), n)).as("__h"))
      .select(explode(bloomPositions(col("__h"), mBits, k)).as("bit"))
      .distinct()
      .write.mode("append").format("parquet").saveAsTable(tableName)
  }

  /** [[bloomDecontaminationFlags]] served from the persisted index:
    * same flags, same oracle twin, zero benchmark re-hashing — the bit
    * roster is read (distinct, ≤ mBits rows) and broadcast.
    */
  def bloomDecontaminationFromIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tableName: String,
      normForm: String = NormForm.Default
  ): DataFrame = {
    val spark = df.sparkSession
    NormForm.check(bloomIndexNormForm(spark, tableName), normForm, tableName)
    val (n, mBits, k) = readBloomIndexParams(spark, tableName)
    val bits = spark.table(tableName).select(col("bit").as("__bit")).distinct()
    bloomFlagsAgainstBits(df, idCol, textCol, bits, n, mBits, k)
  }

  /** One-row health report: stored parameters, distinct set bits, the
    * exact integer fill ratio (ppm), and the textbook false-positive
    * estimate `fill^k` (ppm, floating telemetry — the flags themselves
    * stay exact). Fill climbing toward 1 means every probe starts
    * hitting set bits and the filter silently flags everything: the
    * one staleness mode a bloom has, and the signal to rebuild wider.
    */
  def bloomIndexStats(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): DataFrame = {
    val (n, mBits, k) = readBloomIndexParams(spark, tableName)
    spark.table(tableName).select(col("bit")).distinct()
      .agg(count(lit(1)).as("set_bits"))
      .select(
        lit(mBits).as("m_bits"), lit(k).as("k_hashes"), lit(n).as("shingle_n"),
        col("set_bits"),
        // `div` is Spark's integral division — long*long/long via `/`
        // would round-trip through DOUBLE and could be off by one ppm.
        expr(s"(set_bits * 1000000L) div ${mBits.toLong}L").as("fill_ppm"),
        round(pow(col("set_bits").cast("double") / lit(mBits.toDouble), k) * 1e6)
          .cast("long").as("est_fp_ppm"))
  }

  /** Staleness verdict for the bloom family: true when the fill ratio
    * exceeds `maxFillPpm` (default 25% — est. FP ≈ 0.1% at k=5).
    * Remediation is a rebuild with larger `mBits`, not a compaction:
    * bits cannot be thinned.
    */
  def isStaleBloomIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      maxFillPpm: Long = 250000L): Boolean =
    bloomIndexStats(spark, tableName)
      .select(col("fill_ppm")).head().getLong(0) > maxFillPpm

  /** The width a fill-stale bloom should REBUILD at: the smallest
    * power-of-two multiple of the stored width whose PREDICTED fill
    * ratio clears the staleness bar, capped at 2^30 bit positions.
    * Prediction uses the CURRENT set-bit count — a lower bound on the
    * rebuilt filter's (widening splits collisions, so set bits can
    * only grow slightly), which is why the caller re-reads the fresh
    * staleness flag afterwards instead of trusting the estimate.
    * `None` when the stored width is already at the cap — the one
    * case where a rebuild cannot help and repeating it every
    * maintenance pass would thrash a full-corpus write for nothing.
    * A width that can grow but cannot clear the bar even at the cap
    * still returns the cap (one honest best-effort rebuild; the next
    * pass then reads `None` and reports instead of repeating).
    */
  def bloomRebuildBits(
      storedBits: Int,
      setBits: Long,
      maxFillPpm: Long = 250000L): Option[Int] = {
    require(storedBits > 0 && setBits >= 0 && maxFillPpm > 0)
    val cap = 1 << 30
    if (storedBits >= cap) None
    else {
      var m = storedBits.toLong
      while (m < cap && setBits * 1000000L / m > maxFillPpm) m *= 2
      Some(math.min(m, cap.toLong).toInt)
    }
  }

  /** Top-`k` vocabulary with cumulative corpus coverage — the
    * tokenizer-training precursor: which tokens, ranked by frequency,
    * cover what share of all token occurrences. `cum_ppm` is the
    * running coverage in parts-per-million computed by INTEGER
    * division (`cum_cnt·10^6 div N`), so the output is exact in any
    * engine — no float in the pipeline at all.
    *
    * Scale shape (100 TB): one shuffled token count with map-side
    * combine (vocabulary-bounded), one scalar total (broadcast), and a
    * TakeOrdered for the top-k — the only window runs over the k
    * surviving rows (k is a user constant, e.g. 10^2..10^5), NOT the
    * corpus, so the single-partition window that is a scale bug
    * elsewhere is a k-bounded epilogue here.
    */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      k: Int = 100
  ): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    top
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cnt",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_ppm", expr("cum_cnt * 1000000 div n_total"))
      .select("rank", "token", "cnt", "cum_cnt", "cum_ppm")
  }

  /** Per-document curation VERDICTS — the BATCH twin of the streaming
    * funnel's stage order
    * ([[graft.streaming.CorpusIngest.startCuratedIngest]]'s identity):
    *
    *  - `low_quality` — fails the structural gate
    *    ([[TextAnalysis.qualityScore]] < minQuality OR
    *    [[TextAnalysis.wordRepetitionRatio]] > maxWordRep), counted
    *    here even when the doc is ALSO contaminated (stage order);
    *  - `contaminated` — quality passer sharing an exact `n`-token
    *    shingle with the benchmark ([[decontaminationFlags]]);
    *  - `duplicate` — CLEAN passer whose normalized fingerprint's
    *    keep-first keeper (lowest clean id) is another doc — the
    *    keeper election runs among clean docs ONLY, so a contaminated
    *    copy never shadows a clean sibling out of the corpus;
    *  - `accepted` — everything else.
    *
    * One declarative plan: a codegen'd quality projection, one
    * broadcast shingle semi-join, one window over the fingerprint
    * partition (min over clean ids). `.filter(col("verdict") ===
    * "accepted")` IS the funnel; the verdict frame is its audit.
    */
  def curationVerdicts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      minQuality: Double = 0.3,
      maxWordRep: Double = 0.3,
      n: Int = 8,
      normalizeForm: Option[String] = None
  ): DataFrame = {
    // batch parity with startCuratedIngest's head-of-funnel option:
    // every verdict stage — quality, decontamination, the dedup
    // fingerprint — reads the normalized text, so composed/decomposed
    // variants share one verdict group (BOTH sides normalize: an
    // un-normalized benchmark must not stop matching normalized text)
    normalizeForm.foreach(graft.functions.NormalizeExpression.modeOf)
    val (df0, benchmark0) = normalizeForm match {
      case Some(form) => (
        df.withColumn(textCol, normalizeText(col(textCol), form)),
        benchmark.withColumn(benchTextCol,
          normalizeText(col(benchTextCol), form)))
      case None => (df, benchmark)
    }
    curationVerdictsImpl(df0, idCol, textCol, benchmark0, benchTextCol,
      minQuality, maxWordRep, n)
  }

  private def curationVerdictsImpl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      minQuality: Double,
      maxWordRep: Double,
      n: Int
  ): DataFrame = {
    val flags = decontaminationFlags(df, idCol, textCol, benchmark,
      benchTextCol, n).select(col(idCol), col("contaminated"))
    val q = TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
      TextAnalysis.wordRepetitionRatio(col(textCol)) <= maxWordRep
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    df.join(flags, Seq(idCol))
      .withColumn("__q", q)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__clean", col("__q") && !col("contaminated"))
      .withColumn("__keeper",
        min(when(col("__clean"), col(idCol))).over(w))
      .select(col(idCol),
        when(!col("__q"), lit("low_quality"))
          .when(col("contaminated"), lit("contaminated"))
          .when(col(idCol) =!= col("__keeper"), lit("duplicate"))
          .otherwise(lit("accepted")).as("verdict"))
  }

  /** URL policy flags — the domain/pattern blocklist stage every
    * crawl pipeline runs before content filtering (CCNet/RefinedWeb's
    * URL filtering): canonicalize ([[canonicalizeUrl]]), extract the
    * host ([[urlHost]]), and flag rows whose host IS a blocked domain
    * or sits under one (`host == d` or `host ends with ".d"` — the
    * subdomain rule), or whose canonical URL matches any blocked
    * pattern. Flags, not a filter, so the caller can audit what a
    * policy would remove before enforcing it (`.filter(!col(
    * "blocked"))` enforces). Everything is a codegen'd projection —
    * zero shuffles, zero UDFs; blocklists are compile-time constants
    * in the plan, the right shape for the thousands-of-domains case
    * is a broadcast semi-join the caller can compose instead.
    *
    * @return input columns + (host, blocked_domain, blocked_pattern,
    *         blocked)
    */
  def urlPolicyFlags(
      df: DataFrame,
      urlCol: String,
      blockedDomains: Seq[String] = Nil,
      blockedPatterns: Seq[String] = Nil
  ): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val host = urlHost(canon)
    val bd =
      if (blockedDomains.isEmpty) lit(false)
      else blockedDomains.map(d =>
        host === lit(d) || host.endsWith("." + d)).reduce(_ || _)
    val bp =
      if (blockedPatterns.isEmpty) lit(false)
      else blockedPatterns.map(p => canon.rlike(p)).reduce(_ || _)
    df.withColumn("host", host)
      .withColumn("blocked_domain", bd)
      .withColumn("blocked_pattern", bp)
      .withColumn("blocked", col("blocked_domain") || col("blocked_pattern"))
  }

  /** Line-level phrase blocklist — the C4 "policy line" dropper
    * beside [[c4LineFilter]]'s structural one: remove every line
    * containing any blocked phrase (case-insensitive substring —
    * "enable javascript", "lorem ipsum", "terms of use"), reassemble
    * the survivors in order. Splits on `\r?\n` like its structural
    * sibling (the CRLF rule). One codegen'd array pipeline, zero
    * shuffles, zero explodes.
    */
  def lineBlocklistFilter(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "need at least one blocked phrase")
    require(phrases.forall(_.nonEmpty), "blocked phrases must be non-empty")
    array_join(filter(split(text, "\r?\n"), l =>
      !phrases.map(p => lower(l).contains(lit(p.toLowerCase(java.util.Locale.ROOT))))
        .reduce(_ || _)), "\n")
  }

  /** Line accounting for [[lineBlocklistFilter]]:
    * (lines_in, lines_kept) — [[c4LineStats]]'s contract for the
    * policy dropper. Empty text counts zero lines in and zero kept.
    */
  def lineBlocklistStats(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "need at least one blocked phrase")
    val lines = split(text, "\r?\n")
    val kept = filter(lines, l =>
      !phrases.map(p => lower(l).contains(lit(p.toLowerCase(java.util.Locale.ROOT))))
        .reduce(_ || _))
    struct(
      when(length(text) > 0, size(lines).cast("long")).otherwise(lit(0L))
        .as("lines_in"),
      when(length(text) > 0, size(kept).cast("long")).otherwise(lit(0L))
        .as("lines_kept"))
  }

  /** Distinct-n diversity statistics per corpus slice — the standard
    * corpus-health metric (high duplication/templating collapses the
    * distinct-n ratio long before exact dedup can see it): for each
    * group, the total word n-gram occurrences, the distinct n-grams,
    * and their ratio in exact ppm. N-gram construction follows
    * [[TextAnalysis.topNgramStats]]'s convention (a doc shorter than
    * `n` tokens contributes its whole text as one gram), so the two
    * surfaces reconcile. Scale shape: one tokenize+explode pass, one
    * two-level aggregate — (group, gram) partial counts first (the
    * map-side combine bounds the shuffle at the distinct-gram
    * cardinality), then the group rollup; exact, no sketches — swap
    * in [[corpusSketchStats]]'s KMV estimate when the distinct count
    * itself is the bottleneck.
    */
  def distinctNgramStats(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 2
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // materialize the token array in a child projection: inlining the
    // tokenize into the generator re-ran the regex split once per GRAM
    // inside the transform lambda (no CSE inside HOFs) — O(tokens²)
    // splits per document, measured 5.6 s → sub-second at sf0.1
    val toks = col("__toks")
    val grams = when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    val perGram = df
      .select(col(groupCol),
        TextAnalysis.tokens(lower(trim(col(textCol)))).as("__toks"))
      .select(col(groupCol), explode(grams).as("__g"))
      .groupBy(col(groupCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
    perGram.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_grams"),
        count(lit(1)).as("distinct_grams"))
      .withColumn("distinct_ppm",
        expr("distinct_grams * 1000000 div n_grams"))
  }

  // ------------------------------- embedding (semantic) decontamination

  /** Semantic decontamination: flag corpus documents whose EMBEDDING is
    * near-duplicate of any benchmark embedding — the contamination the
    * n-gram families ([[decontaminationFlags]] and kin) structurally
    * miss, because a paraphrased eval question shares meaning, not
    * 8-gram shingles. Output contract matches the lexical family:
    * `(id, n_hits, contaminated)` with `n_hits` = how many benchmark
    * vectors sit at cosine ≥ `threshold` (an exact integer — the float
    * only ever crosses the threshold with the planted-margin room the
    * gate fixtures guarantee).
    *
    * Scale shape (100 TB): eval benchmarks are small by nature, so the
    * benchmark side BROADCASTS and the corpus side makes one scan —
    * n·m dot kernels, no shuffle of vectors. For a benchmark too big
    * to broadcast, use [[embeddingDecontaminationBanded]].
    */
  def embeddingDecontaminationFlags(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val c = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__vn", graft.functions.VectorFunctions.norm(col("__v")))
    val b = benchmark.select(col(benchVecCol).cast("array<double>").as("__bv"))
      .withColumn("__bn", graft.functions.VectorFunctions.norm(col("__bv")))
    val cos = when(col("__vn") * col("__bn") === 0.0, lit(0.0))
      .otherwise(graft.functions.VectorFunctions.dot(col("__v"), col("__bv")) /
        (col("__vn") * col("__bn")))
    val hits = c.crossJoin(broadcast(b))
      .filter(cos >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    df.select(col(idCol)).join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Banded semantic decontamination — the both-sides-big arm: neither
    * frame broadcasts its vectors. Both sides hash through the SAME
    * portable random-hyperplane family the LSH searcher uses
    * ([[graft.functions.VectorFunctions.lshSignature]], split into
    * `nBands` bucket keys); candidate (doc, bench) pairs come from a
    * shuffle join on (band, bucket) — only colliding vectors ever
    * meet — and every candidate is verified with the exact cosine
    * before it can flag. Verification makes false positives
    * impossible; recall is the banding trade (near-identical vectors
    * share every band, which is what contamination looks like).
    * Same output contract as [[embeddingDecontaminationFlags]] —
    * including the id-uniqueness requirement: the multi-band dedupe
    * keys on (id, benchmark row), so duplicate corpus ids carrying
    * different vectors would collapse arbitrarily (and diverge from
    * the brute arm). Dedupe upstream first.
    */
  def embeddingDecontaminationBanded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double,
      nBits: Int = 6,
      nBands: Int = 6
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    import graft.functions.VectorFunctions
    // the SHARED band split (VectorFunctions.lshBands) — the searcher
    // and this screen bucket identically by construction
    def bands(vec: Column): Column = VectorFunctions.lshBands(vec, nBits, nBands)
    val c = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__vn", VectorFunctions.norm(col("__v")))
      .withColumn("__b", explode(bands(col("__v"))))
      .select(col(idCol), col("__v"), col("__vn"),
        col("__b.__band").as("__band"), col("__b.__sig").as("__sig"))
    val b = benchmark.select(col(benchVecCol).cast("array<double>").as("__bv"))
      .withColumn("__bid", monotonically_increasing_id())
      .withColumn("__bn", VectorFunctions.norm(col("__bv")))
      .withColumn("__b", explode(bands(col("__bv"))))
      .select(col("__bid"), col("__bv"), col("__bn"),
        col("__b.__band").as("__band"), col("__b.__sig").as("__sig"))
    val cos = when(col("__vn") * col("__bn") === 0.0, lit(0.0))
      .otherwise(VectorFunctions.dot(col("__v"), col("__bv")) /
        (col("__vn") * col("__bn")))
    // exact-cosine FILTER before the per-(doc, bench) dedupe, and the
    // dedupe shuffles only the slim (id, __bid) pairs: the r18 soak
    // measured the old dedupe-first order at 35x over 10x data — the
    // candidate frame grows ~(corpus x benchmark)/2^nBits and the old
    // plan shuffled every candidate WITH both vectors attached just to
    // drop multi-band repeats. The filter is codegen'd map-side work
    // (no shuffle) that kills ~all false candidates first; collided
    // rows are identical modulo band, so filter-then-dedupe keeps the
    // exact same (doc, bench) hit set and the same n_hits.
    val hits = c.join(b, Seq("__band", "__sig"))
      .filter(cos >= threshold)
      .select(col(idCol), col("__bid"))
      .dropDuplicates(idCol, "__bid")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    df.select(col(idCol)).join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** The benchmark side of [[embeddingDecontaminationBanded]] as a
    * PERSISTED surface — the semantic analogue of [[writeBloomIndex]]:
    * each benchmark vector lands as `nBands` band rows (deterministic
    * `__bid` = xxhash64 of the vector, exact vector + norm carried for
    * the verify cosine) so a streaming ingest can screen every
    * micro-batch against the stored rows without re-hashing the
    * benchmark per epoch. Bands come from the SAME shared
    * [[graft.functions.VectorFunctions.lshBands]] family as the batch
    * side and the LSH searcher — bucketing identically by construction.
    *
    * Scale shape: O(|benchmark| · nBands) rows; a batch probe is a
    * shuffle join on (band, sig) — neither side broadcasts, the
    * both-sides-big contract of the banded arm, and appends are
    * O(new suite) with replay residue deduped at read.
    *
    * `nBits = 0` (the default) sizes the band width from the benchmark
    * like [[Dedup.embeddingNearDupPairs]] does from its corpus
    * ([[Dedup.lshBitsFor]]): fixed-width bands make probe candidates
    * grow ~(corpus · benchmark)/2^nBits — the r18 soak measured the
    * fixed 6-bit default at 35x over 10x data on the full-corpus
    * probe. Wider bands trade per-band recall for NON-identical
    * near-dups ((1−θ/π)^bits per band); exact-copy recall is 1.0 at
    * any width, and every surviving candidate is still exact-cosine
    * verified. Pass an explicit `nBits` when a fixed recall target
    * matters more than scaling. The chosen width travels with the
    * index (`_stats`), so probes and appends always use it.
    *
    * Content identity: byte-identical benchmark vectors collapse to ONE
    * stored identity, so `n_hits` from the index counts DISTINCT
    * benchmark vectors hit, where the in-memory arms count benchmark
    * ROWS (a doubled row counts twice there). `contaminated` — the flag
    * the ingest screens on — is identical either way.
    */
  def writeEmbeddingBandIndex(
      benchmark: DataFrame,
      benchVecCol: String,
      tableName: String,
      nBits: Int = 0,
      nBands: Int = 6
  ): Unit = {
    val bits =
      if (nBits > 0) nBits else Dedup.lshBitsFor(benchmark.count(), nBands)
    require(bits > 0 && nBands > 0 && bits * nBands <= 64,
      s"nBits*nBands must fit the 64-bit signature, got $bits*$nBands")
    val spark = benchmark.sparkSession
    import spark.implicits._
    embBandRows(benchmark, benchVecCol, bits, nBands)
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    Seq((bits, nBands)).toDF("n_bits", "n_bands")
      .write.mode("overwrite").format("parquet").saveAsTable(tableName + "_stats")
  }

  private def embBandRows(
      benchmark: DataFrame, benchVecCol: String,
      nBits: Int, nBands: Int): DataFrame =
    benchmark.select(col(benchVecCol).cast("array<double>").as("__bv"))
      // deterministic row identity: a replayed append writes the SAME
      // rows again (deduped at read), never a second identity for the
      // same vector — monotonically_increasing_id would do exactly that
      .withColumn("__bid", xxhash64(col("__bv")))
      .withColumn("__bn", graft.functions.VectorFunctions.norm(col("__bv")))
      .withColumn("__b",
        explode(graft.functions.VectorFunctions.lshBands(col("__bv"), nBits, nBands)))
      .select(col("__bid"), col("__bv"), col("__bn"),
        col("__b.__band").as("__band"), col("__b.__sig").as("__sig"))

  private def readEmbBandParams(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): (Int, Int) = {
    val r = spark.table(tableName + "_stats").collect()
    require(r.length == 1, s"${tableName}_stats must hold exactly one row")
    (r.head.getInt(0), r.head.getInt(1))
  }

  /** Union a new eval suite's band rows into the index — O(suite)
    * work under the STORED band-family parameters, the
    * [[appendToBloomIndex]] contract: takes effect at the next read
    * (a streaming screen picks it up at its next micro-batch).
    */
  def appendToEmbeddingBandIndex(
      tableName: String,
      suite: DataFrame,
      benchVecCol: String
  ): Unit = {
    val spark = suite.sparkSession
    val (nBits, nBands) = readEmbBandParams(spark, tableName)
    embBandRows(suite, benchVecCol, nBits, nBands)
      .write.mode("append").format("parquet").saveAsTable(tableName)
  }

  /** Remove a RETIRED eval suite from the band index — the verb bloom
    * structurally cannot have (bits are shared; removal there = rebuild):
    * the band family stores discrete rows per vector, so retiring a
    * suite is an O(|index|) anti-join rewrite keyed on the suite's
    * O(|suite|) content identities, through the staged crash-safe swap
    * (readers never see a partial table). DELETE == REBUILD contract:
    * removing suite B from an A∪B index leaves exactly the rows
    * [[writeEmbeddingBandIndex]] would store for A alone — same
    * identities, same band rows, probes agree bit for bit (spec-pinned).
    *
    * Identity is CONTENT identity (`__bid` = xxhash64 of the cast
    * vector, the index's replay rule): a vector byte-identical between
    * the removed suite and a retained one is removed too — when suites
    * can overlap, re-append the retained suite afterwards
    * ([[appendToEmbeddingBandIndex]] is replay-idempotent, so the
    * re-append restores exactly the shared rows).
    *
    * @return (rows before, rows after) from the staged rewrite
    */
  def deleteFromEmbeddingBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      suite: DataFrame,
      benchVecCol: String
  ): (Long, Long) = {
    val bids = suite
      .select(xxhash64(col(benchVecCol).cast("array<double>")).as("__bid"))
      .distinct()
    // no explicit broadcast hint: eval suites are usually tiny (AQE
    // picks a broadcast anti-join at runtime), but a large retired
    // suite must not be forced through an oversized driver-side
    // broadcast — the left_anti is correct under either strategy
    graft.plans.Compaction.rewriteTable(spark, tableName, tag = "delete")(
      _.join(bids, Seq("__bid"), "left_anti"))
  }

  /** [[embeddingDecontaminationBanded]] served from the persisted
    * index: same flags, same exact-cosine verification (false
    * positives impossible), zero benchmark re-hashing per call. Same
    * id-uniqueness requirement as the in-memory arm; duplicate stored
    * band rows (replayed appends, suite overlap) collapse in the
    * per-(id, benchmark-row) dedupe.
    */
  def embeddingDecontaminationFromIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tableName: String,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    import graft.functions.VectorFunctions
    val spark = df.sparkSession
    val (nBits, nBands) = readEmbBandParams(spark, tableName)
    val c = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__vn", VectorFunctions.norm(col("__v")))
      .withColumn("__b", explode(VectorFunctions.lshBands(col("__v"), nBits, nBands)))
      .select(col(idCol), col("__v"), col("__vn"),
        col("__b.__band").as("__band"), col("__b.__sig").as("__sig"))
    val b = spark.table(tableName)
    val cos = when(col("__vn") * col("__bn") === 0.0, lit(0.0))
      .otherwise(VectorFunctions.dot(col("__v"), col("__bv")) /
        (col("__vn") * col("__bn")))
    // filter-then-dedupe, slim pair shuffle — the banded arm's plan
    // (see embeddingDecontaminationBanded): the r18 soak read the
    // dedupe-first order at 35x over 10x data on this exact probe
    val hits = c.join(b, Seq("__band", "__sig"))
      .filter(cos >= threshold)
      .select(col(idCol), col("__bid"))
      .dropDuplicates(idCol, "__bid")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    df.select(col(idCol)).join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** One-row health report for an embedding-band index: stored band
    * parameters, distinct benchmark vectors, total band rows, and the
    * replay-residue duplicate ratio (ppm of rows beyond one per
    * (vector, band)). Flags stay exact under residue — what degrades
    * is bytes scanned per probe; past the threshold, compact.
    */
  def embeddingBandIndexStats(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): DataFrame = {
    val (nBits, nBands) = readEmbBandParams(spark, tableName)
    spark.table(tableName)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("__bid")).as("n_vectors"),
        count_distinct(col("__bid"), col("__band")).as("n_distinct"))
      .select(lit(nBits).as("n_bits"), lit(nBands).as("n_bands"),
        col("n_vectors"), col("n_rows"),
        expr("((n_rows - n_distinct) * 1000000L) div greatest(n_rows, 1L)")
          .as("dup_ppm"))
  }

  /** Staleness verdict for the embedding-band family: true when
    * replay-residue duplicates exceed `maxDupPpm` (default 25%).
    * Remediation is [[compactEmbeddingBandIndex]].
    */
  def isStaleEmbeddingBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      maxDupPpm: Long = 250000L): Boolean =
    embeddingBandIndexStats(spark, tableName)
      .select(col("dup_ppm")).head().getLong(0) > maxDupPpm

  /** Rewrite the band table to one row per (vector, band) through the
    * staged crash-safe swap — reclaims replay/append residue; probe
    * results are unchanged (they dedupe at read regardless).
    */
  def compactEmbeddingBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String): (Long, Long) =
    graft.plans.Compaction.rewriteTable(spark, tableName, tag = "compact")(
      _.dropDuplicates("__bid", "__band"))

  // ------------------------------------------- DSIR data selection

  /** Hashed unigram+bigram feature buckets — the DSIR feature map
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): every token and every adjacent token
    * pair hashes through the portable KR fold + Knuth mix into one of
    * `buckets` bins. One tokenize pass builds BOTH gram orders as a
    * single array (unigrams ++ bigrams) so the explode runs once.
    * Output: `keep` columns + `bucket`, one row per feature
    * OCCURRENCE (multiplicity preserved — the n-gram model is
    * multinomial, not set-valued).
    */
  private def hashedNgramBuckets(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      keep: Seq[Column]
  ): DataFrame = {
    val w = filter(TextAnalysis.tokens(lower(col(textCol))),
      t => length(t) > 0)
    val bi = zip_with(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    df.select(keep :+ explode(concat(w, bi)).as("__feat"): _*)
      .select(keep :+ pmod(Sketches.tokenHash(col("__feat")),
        lit(buckets.toLong)).as("bucket"): _*)
  }

  /** DSIR importance log-weights: score every `raw` document by how
    * much more likely its hashed-n-gram features are under the TARGET
    * distribution than under the RAW distribution,
    *
    *   log w(x) = Σ_f [ ln p_target(bucket(f)) − ln p_raw(bucket(f)) ]
    *
    * over the doc's feature occurrences, with add-one smoothing on
    * both bag-of-buckets multinomials (Xie et al. 2023). High weight
    * = "reads like the target domain"; the companion
    * [[dsirResample]] turns the weights into a Gumbel top-k sample.
    *
    * Engine-exact like [[domainAffinityScores]]: both `ln` terms
    * round to micro-unit fixed point BEFORE the subtraction and the
    * per-document sum, so the fold is order-independent and the
    * DuckDB oracle bit-matches; the weight is returned as the exact
    * integer `logw_fx` (micro-nats).
    *
    * Scale shape (100 TB): the target pass reduces to ≤ `buckets`
    * count rows; the raw feature stream (persisted — the bucket count
    * and the scoring pass both consume it) aggregates to ≤ `buckets`
    * rows for the ratio table, which BROADCASTS to the scoring join —
    * no shuffle keyed on anything wider than the doc id ever happens,
    * and the per-doc sum combines map-side. `buckets` caps the model
    * size by construction (the hashing trick), so the ratio table is
    * a bounded broadcast at any corpus size.
    *
    * @return (idCol, n_feats, logw_fx) — one row per raw doc; docs
    *         with zero features (empty text) score 0 with n_feats 0
    */
  def dsirLogWeights(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      buckets: Int = 1 << 13
  ): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val b = lit(buckets.toLong)
    val tgtB = hashedNgramBuckets(target, targetTextCol, buckets, Nil)
    val tgtCounts = tgtB.groupBy("bucket").agg(count(lit(1)).as("__ct"))
    val tgtTotal = tgtB.agg(count(lit(1)).as("__nt"))
    val rawB = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      hashedNgramBuckets(raw, textCol, buckets, Seq(col(idCol))),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCounts = rawB.groupBy("bucket").agg(count(lit(1)).as("__cr"))
    val rawTotal = rawB.agg(count(lit(1)).as("__nr"))
    // ≤ buckets rows: every bucket any raw doc can hash into has a
    // row here, so the scoring join below is inner and lossless
    val ratio = rawCounts
      .join(tgtCounts, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(tgtTotal))
      .crossJoin(broadcast(rawTotal))
      .select(col("bucket"),
        (TextAnalysis.fxLong(log(
          (coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            (col("__nt") + b).cast("double")) * lit(1e6)) -
          TextAnalysis.fxLong(log(
            (col("__cr") + 1).cast("double") /
              (col("__nr") + b).cast("double")) * lit(1e6))).as("__term"))
    val perDoc = rawB
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__term")).as("__sum"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("__sum"), lit(0L)).as("logw_fx"))
  }

  /** Persist the DSIR bucket multinomials as a self-describing model —
    * train once on a representative raw pool, score every future
    * batch without re-aggregating the 100 TB raw distribution (the
    * [[writeNaiveBayesModel]] pattern for importance weighting).
    * Layout: `<table>` holds (bucket, ct, cr) for every bucket either
    * side touched (≤ `buckets` rows); `<table>_stats` one row
    * (nt, nr, b) with the totals RE-AGGREGATED from the written count
    * table, so the two surfaces cannot drift.
    */
  def writeDsirModel(
      target: DataFrame,
      targetTextCol: String,
      raw: DataFrame,
      rawTextCol: String,
      tableName: String,
      buckets: Int = 1 << 13
  ): Unit = {
    require(buckets >= 2, "buckets must be >= 2")
    val spark = target.sparkSession
    val tc = hashedNgramBuckets(target, targetTextCol, buckets, Nil)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val rc = hashedNgramBuckets(raw, rawTextCol, buckets, Nil)
      .groupBy("bucket").agg(count(lit(1)).as("cr"))
    tc.join(rc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .write.mode("overwrite").format("parquet").saveAsTable(tableName)
    spark.catalog.refreshTable(tableName)
    spark.table(tableName)
      .agg(coalesce(sum(col("ct")), lit(0L)).as("nt"),
        coalesce(sum(col("cr")), lit(0L)).as("nr"))
      .withColumn("b", lit(buckets.toLong))
      .write.mode("overwrite").format("parquet").saveAsTable(tableName + "_stats")
    spark.catalog.refreshTable(tableName + "_stats")
  }

  /** Score documents against a PERSISTED DSIR model
    * ([[writeDsirModel]]). Scoring the train-time raw pool reproduces
    * [[dsirLogWeights]] bit for bit (same fixed-point formula; every
    * one of those docs' buckets carries cr ≥ 1 in the model). NEW
    * documents may hash features into buckets the model never saw —
    * those take the both-zero smoothing arm,
    * `fx(ln(1/(nt+B))) − fx(ln(1/(nr+B)))`, the same values the
    * formula yields for a (ct=0, cr=0) row, so an unseen bucket is
    * indistinguishable from an unpopulated one. Per batch: one
    * tokenize pass + two bounded broadcasts (ratio table ≤ B rows,
    * stats one row) — an ingest epoch never touches the corpora the
    * model was fit on.
    */
  def dsirScoresFromModel(
      spark: org.apache.spark.sql.SparkSession,
      tableName: String,
      docs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val st = spark.table(tableName + "_stats")
    val buckets = st.select("b").head().getLong(0).toInt
    val ratio = spark.table(tableName)
      .crossJoin(broadcast(st))
      .select(col("bucket"),
        (TextAnalysis.fxLong(log(
          (col("ct") + 1).cast("double") /
            (col("nt") + col("b")).cast("double")) * lit(1e6)) -
          TextAnalysis.fxLong(log(
            (col("cr") + 1).cast("double") /
              (col("nr") + col("b")).cast("double")) * lit(1e6))).as("__term"))
    val perDoc = hashedNgramBuckets(docs, textCol, buckets, Seq(col(idCol)))
      .join(broadcast(ratio), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(st))
      .withColumn("__t", coalesce(col("__term"),
        TextAnalysis.fxLong(log(
          lit(1.0) / (col("nt") + col("b")).cast("double")) * lit(1e6)) -
          TextAnalysis.fxLong(log(
            lit(1.0) / (col("nr") + col("b")).cast("double")) * lit(1e6))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__t")).as("__sum"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("__sum"), lit(0L)).as("logw_fx"))
  }

  /** DSIR importance RESAMPLING: draw `k` docs from `raw` without
    * replacement with probability ∝ their importance weight, via the
    * Gumbel top-k trick — rank by `log w(x) + Gumbel(0,1)` and keep
    * the k largest. The Gumbel noise is DERANDOMIZED portably: the
    * uniform is read from the doc id's own KR hash,
    * `u = (hash(id) + 0.5) / 2^32`, `g = −ln(−ln u)` — deterministic,
    * replayable in any engine, and independent of the weights. The
    * perturbed key rounds to the same micro-unit fixed point as
    * `logw_fx`, so selection (and every tie) is integer-decided.
    *
    * Scale shape: [[dsirLogWeights]]' bounded-broadcast passes plus
    * one TakeOrdered — `orderBy(...).limit(k)` plans as a per-
    * partition top-k and a k-row driver merge, never a global sort.
    *
    * @return the k selected rows, (idCol, n_feats, logw_fx, key_fx)
    */
  def dsirResample(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      buckets: Int = 1 << 13
  ): DataFrame = {
    require(k >= 1, "k must be positive")
    val u = (Sketches.tokenHash(col(idCol).cast("string")).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    dsirLogWeights(raw, idCol, textCol, target, targetTextCol, buckets)
      .withColumn("key_fx",
        col("logw_fx") + TextAnalysis.fxLong(-log(-log(u)) * lit(1e6)))
      .orderBy(col("key_fx").desc, col(idCol))
      .limit(k)
  }
}
