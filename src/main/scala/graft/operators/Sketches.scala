package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{CmSketchExpression, KmvSketchExpression, KrHashExpression, KrShingleHashExpression}

/** Portable cardinality / quantile estimation — the sizing layer a
  * 100 TB corpus needs before it can be planned: distinct-shingle
  * counts size LSH band widths and vocab builds, token-length
  * quantiles size packing and length-band mixes. Exact
  * `countDistinct` at that scale shuffles every distinct value; the
  * KMV sketch bounds aggregate state at k longs per group instead.
  * House rule for every approximate path: the pipeline is modular
  * integer arithmetic an ANSI-SQL engine replays exactly, so each
  * gate has a full DuckDB oracle rather than a weaker rows-only
  * check.
  *
  * Reference analog: none — the reference engine
  * (OracleSync2MySQL) verifies row counts only (compareDb,
  * cmd/compare_table.go); it has no estimation layer. This family is
  * part of the training-data-pipeline extension surface, not a port.
  */
object Sketches {

  /** Hash space of the mixed hashes: [0, 2^32). */
  val M: Long = 4294967296L
  private val Mix = 2654435761L

  /** Knuth mix onto [0, 2^32): KR folds (mod 1e9+7) are NOT uniform —
    * short inputs land near 0, wrecking a k-th-smallest order
    * statistic — so scatter with the odd-constant multiply. Products
    * stay < 2^62, so BIGINT replays exactly: `(h * 2654435761) %
    * 4294967296` (operands non-negative ⇒ `%` = pmod).
    */
  def mix32(h: Column): Column = pmod(h * lit(Mix), lit(M))

  /** Portable per-token hash: the KR fold through the mix — the unit
    * the streaming vocab rollup sketches (shingle variants use the
    * fused [[KrShingleHashExpression]] kernel instead).
    */
  def tokenHash(tok: Column): Column = mix32(KrHashExpression.krHash(tok))

  /** KMV estimate from a sorted sketch array of size ≤ k: exact count
    * while the sketch is partial (fewer than k distinct values exist),
    * else the unbiased k-minimum-values estimator
    * `(k-1)·M div (h_k + 1)` — integer division (`div` here, `//` in
    * DuckDB) so no float rounding can split the engines; the `+1`
    * guards a zero k-th value.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast(LongType))
      .otherwise(call_function("div",
        lit((k - 1) * M), element_at(sketch, k) + lit(1L)))

  /** Per-group distinct-`n`-shingle estimate in ONE shuffle: the
    * fused Karp–Rabin shingle kernel (identical hashes to
    * [[Dedup.portableMinhashSignatures]], so the DuckDB twin reuses
    * the pinned minhash CTEs), Knuth-mixed, then the bounded KMV
    * aggregate — map-side partials carry ≤ k longs per group
    * (`.explain` shows the partial/final ObjectHashAggregate pair
    * around a single Exchange).
    */
  def kmvDistinctShingles(
      df: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    sketchOf(shingleHashes(df, groupCol, textCol, n), groupCol, k)
      .select(
        col(groupCol),
        kmvEstimate(col("sketch"), k).as("est_distinct"),
        size(col("sketch")).cast(LongType).as("sketch_size"))

  /** Per-group distinct-key estimate for numeric ids (the
    * `count(DISTINCT fk)` shape on a fact table): Knuth-mix the key
    * directly — same lottery arithmetic as Corpus sampling, fully
    * portable.
    */
  def kmvDistinctKeys(
      df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame =
    sketchOf(
      df.select(col(groupCol), mix32(col(keyCol).cast(LongType)).as("mh")),
      groupCol, k)
      .select(
        col(groupCol),
        kmvEstimate(col("sketch"), k).as("est_distinct"),
        size(col("sketch")).cast(LongType).as("sketch_size"))

  /** Exact sketch-array merge with codegen'd built-ins: the k smallest
    * of the distinct union. Every element of the union's true sketch
    * is in some input sketch (each shard kept ITS k smallest), so
    * merging sketch ARRAYS equals sketching the concatenated data —
    * associative, which is what lets per-shard sketches reduce
    * tree-wise at 100 TB instead of re-scanning the corpus.
    */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** The merge identity as a runnable pipeline: sketch two disjoint
    * halves of the corpus separately, merge the sketch ARRAYS,
    * estimate — gated cross-engine against DuckDB sketching the whole
    * table in one pass (`q_sketch_kmv_merge`), pinning the identity
    * exactly, not approximately.
    */
  def kmvMergedShingleEstimate(
      df: DataFrame, groupCol: String, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    def half(r: Int): DataFrame =
      sketchOf(
        shingleHashes(
          df.filter(pmod(col(idCol), lit(2)) === r), groupCol, textCol, n),
        groupCol, k)
        .withColumnRenamed("sketch", s"sketch_$r")
    half(0).join(half(1), Seq(groupCol), "full_outer")
      .select(
        col(groupCol),
        kmvEstimate(
          kmvMerge(
            coalesce(col("sketch_0"), array().cast("array<bigint>")),
            coalesce(col("sketch_1"), array().cast("array<bigint>")),
            k),
          k).as("est_distinct"))
  }

  private def shingleHashes(
      df: DataFrame, groupCol: String, textCol: String, n: Int): DataFrame = {
    val w = TextAnalysis.tokens(lower(col(textCol)))
    df.select(col(groupCol),
        explode(KrShingleHashExpression.krShingleHash(w, n)).as("__h"))
      .select(col(groupCol), mix32(col("__h")).as("mh"))
  }

  private def sketchOf(hashed: DataFrame, groupCol: String, k: Int): DataFrame =
    hashed.groupBy(groupCol)
      .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sketch"))

  /** Deterministic-sample quantiles: keep the 1-in-`rate` slice by the
    * portable Knuth hash of the id (same auditable lottery as Corpus
    * sampling), then EXACT rank-selection quantiles of the token count
    * within each group over the sample. Index arithmetic is integral
    * (`(n-1)·q div 10 + 1` for q in tenths), so both engines select
    * the identical element — no interpolation semantics to disagree
    * over. The rank windows sort only the sample: `rate` is the
    * accuracy/cost dial at 100 TB.
    */
  def sampledTokenQuantiles(
      df: DataFrame, groupCol: String, idCol: String, textCol: String,
      rate: Int, tenths: Seq[Int]): DataFrame = {
    val sampled = df
      .filter(pmod(Corpus.portableHash(col(idCol)), lit(rate.toLong)) === 0)
      .select(
        col(groupCol), col(idCol),
        size(split(col(textCol), " ", -1)).cast(LongType).as("toks"))
    val byTok = Window.partitionBy(groupCol).orderBy(col("toks"), col(idCol))
    val whole = Window.partitionBy(groupCol)
    val ranked = sampled
      .withColumn("rn", row_number().over(byTok))
      .withColumn("cnt", count(lit(1)).over(whole))
    val qCols = tenths.map { q =>
      val idx = call_function("div", (col("cnt") - 1) * q, lit(10L)) + lit(1L)
      max(when(col("rn") === idx, col("toks"))).as(s"p${q}0_tokens")
    }
    ranked.groupBy(groupCol)
      .agg(qCols.head, qCols.tail :+ max(col("cnt")).as("n_sample"): _*)
  }

  /** Per-group rank-selection quantiles read off the mergeable
    * quantile sketch ([[graft.functions.QuantileSketchExpression]]):
    * ONE bounded-state pass collapses each group's value stream to
    * O(c·log(n/c)) weighted items (map-side partials, single shuffle),
    * then exact integer rank selection over the (value, weight) pairs
    * picks each requested decile — `idx = (W−1)·q div 10 + 1`, the
    * same integral index arithmetic as [[sampledTokenQuantiles]], so
    * no interpolation semantics can split engines. The two quantile
    * paths complement each other: the sample gives probabilistic
    * accuracy on a fraction of the data; the sketch sees EVERY row and
    * carries a deterministic worst-case certificate (`err`, the
    * accumulated compaction budget — true rank within ±err of the
    * reported rank), and its state merges associatively across shards
    * and batches. With c > the group's row count the sketch is exact
    * (`err = 0`) and the gate a full DuckDB oracle — the MG playbook.
    *
    * The rank window sorts sketch ITEMS (≤ c·log levels per group),
    * never the value stream — at 100 TB the sort input is thousands of
    * rows per group regardless of corpus size.
    */
  def sketchQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      c: Int, tenths: Seq[Int]): DataFrame =
    decileSelect(
      qsItems(df, groupCol, valueCol, c), groupCol, tenths,
      max(col("err")).as("err"))

  /** Sketch + explode to (group, err, v, w) item rows — the shared
    * head of [[sketchQuantiles]] and [[mergedQuantiles]].
    * `explode_outer`: a group whose values are ALL null has an empty
    * item array, and a plain explode would silently drop the group
    * from the output; outer keeps it, and the selection tail then
    * reports null deciles with n = 0 rather than no row at all.
    */
  private def qsItems(
      df: DataFrame, groupCol: String, valueCol: String, c: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(graft.functions.QuantileSketchExpression
        .quantileSketch(col(valueCol).cast(LongType), c).as("__sk"))
      .select(col(groupCol), col("__sk.err").as("err"),
        explode_outer(col("__sk.items")).as("__it"))
      .select(col(groupCol), col("err"),
        col("__it.v").as("v"), col("__it.w").as("w"))

  /** Exact integral rank selection over (group, err, v, w) item rows —
    * ONE owner of the `idx = (W−1)·q div 10 + 1` contract both DuckDB
    * twins pin; `errAgg` is the only point the one-pass and merged
    * paths differ (max of one budget vs sum of the halves').
    */
  private def decileSelect(
      ex: DataFrame, groupCol: String, tenths: Seq[Int],
      errAgg: Column): DataFrame = {
    require(tenths.nonEmpty, "need at least one decile")
    val byV = Window.partitionBy(groupCol).orderBy(col("v"), col("w"))
    val whole = Window.partitionBy(groupCol)
    val ranked = ex
      .withColumn("__cum", sum(col("w")).over(byV))
      .withColumn("__tot", sum(col("w")).over(whole))
    val qCols = tenths.map { q =>
      val idx = call_function("div", (col("__tot") - 1) * q, lit(10L)) + lit(1L)
      min(when(col("__cum") >= idx, col("v"))).as(s"p${q}0")
    }
    ranked.groupBy(groupCol)
      .agg(qCols.head,
        qCols.tail :+ errAgg :+ coalesce(max(col("__tot")), lit(0L)).as("n"): _*)
  }

  /** The quantile sketch's merge identity as a runnable pipeline
    * (the [[kmvMergedShingleEstimate]] pattern): sketch two disjoint
    * id-parity halves of the corpus separately, pool the (value,
    * weight) items, read quantiles off the pooled items. In the exact
    * regime the pooled items are the union multiset, so the result
    * equals sketching the whole table in one pass — gated cross-engine
    * (`q_sketch_quantile_merge`) to pin the mergeability contract
    * exactly, not approximately. This is the shape per-shard/per-epoch
    * rollups take at 100 TB: hour sketches pool into day quantiles
    * without revisiting any data.
    */
  def mergedQuantiles(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      c: Int, tenths: Seq[Int]): DataFrame = {
    def half(r: Int): DataFrame =
      qsItems(df.filter(pmod(col(idCol), lit(2)) === r), groupCol, valueCol, c)
        .withColumn("__h", lit(r))
    // pooled budget = the two halves' budgets added (each half's err
    // rides every one of its item rows — read it once per half)
    val errCol = (coalesce(max(when(col("__h") === 0, col("err"))), lit(0L)) +
      coalesce(max(when(col("__h") === 1, col("err"))), lit(0L))).as("err")
    decileSelect(half(0).union(half(1)), groupCol, tenths, errCol)
  }

  /** Per-group heavy hitters via the Misra–Gries sketch
    * ([[graft.functions.MgSketchExpression]]): bounded state (m
    * counters per group) whatever the term cardinality, so the shuffle
    * carries O(m · groups) — the scale path for unbounded term domains
    * (URLs, hosts, n-grams) where the exact twin
    * [[TextAnalysis.topTermsPerGroup]] would shuffle every distinct
    * (group, term) pair. Long format: one row per surviving counter
    * with the group's error budget beside the estimate, so callers can
    * certify `est ≤ true ≤ est + err` row by row. With m ≥ the group's
    * distinct-term count the sketch is exact (`err = 0`) and the
    * output deterministic — the cross-engine oracle regime.
    */
  def heavyHitters(
      df: DataFrame, groupCol: String, termCol: String, m: Int): DataFrame =
    mgExplode(df, groupCol,
      graft.functions.MgSketchExpression.mgSketch(col(termCol), m))

  /** Shared groupBy + sketch-explode tail of [[heavyHitters]] and
    * [[heavyHittersWeighted]] — one place owns the output shape.
    */
  private def mgExplode(
      df: DataFrame, groupCol: String, sketchAgg: Column): DataFrame =
    df.groupBy(groupCol)
      .agg(sketchAgg.as("__sk"))
      .select(
        col(groupCol),
        col("__sk.err").as("err"),
        explode(col("__sk.items")).as("__it"))
      .select(
        col(groupCol),
        col("__it.term").as("term"),
        col("__it.est").as("est"),
        col("err"))

  /** Weighted [[heavyHitters]]: each row contributes `weightCol` (a
    * non-negative BIGINT) of mass to its term instead of 1 — the
    * common production read is BYTES, not rows ("which sources
    * dominate this language's corpus by volume"). Same bounded O(m)
    * state and `est ≤ true ≤ est + err` certificate, with `true` now
    * the term's total weight; with m ≥ the group's distinct-term count
    * no decrement fires and the output is the exact weighted sum (the
    * oracle regime). Zero-weight rows are skipped outright — they
    * carry no mass and must not occupy a counter slot; negative
    * weights fail loudly (they would void the certificate).
    */
  def heavyHittersWeighted(
      df: DataFrame, groupCol: String, termCol: String, weightCol: String,
      m: Int): DataFrame =
    mgExplode(df, groupCol,
      graft.functions.MgSketchExpression
        .mgSketchWeighted(col(termCol), col(weightCol), m))

  /** [[heavyHitters]] over whitespace tokens of a text column. */
  def heavyHitterTokens(
      df: DataFrame, groupCol: String, textCol: String, m: Int): DataFrame =
    heavyHitters(
      df.select(col(groupCol),
          explode(split(col(textCol), " ")).as("__term"))
        .filter(length(col("__term")) > 0),
      groupCol, "__term", m)

  /** Point-query the count–min matrix ([[graft.functions
    * .CmSketchExpression]]) for one hashed term: the minimum of the
    * term's d counters — d codegen'd `element_at` lookups, no
    * interpreted fold. Row j's column replays the sketch's affine
    * family exactly, so any engine holding the same matrix answers the
    * same estimate.
    */
  def cmEstimate(sketch: Column, hv: Column, w: Int, d: Int): Column = {
    // normalize into [0, P) BEFORE the affine multiply, exactly as the
    // sketch's update path does — a raw 64-bit hash (~9e18) would
    // overflow hv·(2j+3) and read DIFFERENT cells than update
    // incremented, silently voiding the one-sided certificate
    val h = pmod(hv, lit(CmSketchExpression.P))
    val cells = (0 until d).map { j =>
      element_at(sketch,
        (lit(j * w + 1) +
          pmod(pmod(h * lit(2L * j + 3L) + lit(97L * j + 1L),
            lit(CmSketchExpression.P)), lit(w.toLong)).cast("int")))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** Per-group token-frequency point queries through a count–min
    * sketch: ONE bounded-state pass collapses each group's token
    * stream to a d×w counter matrix (map-side partials, single
    * shuffle, O(d·w·groups) traffic), then any after-the-fact term
    * list reads its estimates off the matrix — the "how often did
    * these n-grams / hosts / eval probes occur per slice" screen that
    * an exact groupBy(term) can't afford when the term domain is
    * unbounded. Estimates carry count–min's one-sided certificate
    * `true ≤ est`; the DuckDB twin rebuilds the matrix (collisions
    * included) and answers bit-identically — the approximation itself
    * is oracled, not just an exact regime.
    */
  def cmTokenCounts(
      df: DataFrame, groupCol: String, textCol: String,
      queryTokens: Seq[String], w: Int, d: Int): DataFrame = {
    require(queryTokens.nonEmpty, "need at least one query token")
    val hashed = df
      .select(col(groupCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(groupCol), KrHashExpression.krHash(col("__tok")).as("__hv"))
    // every group of the INPUT gets a row per probe — a group whose
    // documents are all token-free has the all-zero matrix (true est 0
    // for every term), not a silently missing row; the oracle grids
    // over all groups, so the pair must agree on this shape
    val zeros = typedlit(Seq.fill(d * w)(0L))
    val sk = df.select(col(groupCol)).distinct()
      .join(
        hashed.groupBy(groupCol)
          .agg(CmSketchExpression.cmSketch(col("__hv"), lit(1L), w, d).as("__sk")),
        Seq(groupCol), "left_outer")
      .select(col(groupCol), coalesce(col("__sk"), zeros).as("__sk"))
    sk.select(col(groupCol), col("__sk"),
        explode(array(queryTokens.map(lit(_)): _*)).as("term"))
      .select(col(groupCol), col("term"),
        cmEstimate(col("__sk"), KrHashExpression.krHash(col("term")), w, d)
          .as("est"))
  }

  /** Join-key overlap estimate from two KMV sketches — the
    * join-planning screen ([[graft.plans.ScaleJoins]]'s companion):
    * before committing 100 TB to a shuffle join, one bounded-state
    * pass per side (O(k) aggregate state, map-side partials) estimates
    * each side's distinct-key count, their Jaccard resemblance, and
    * the distinct-key overlap `J · |A ∪ B|` — the number that decides
    * broadcast vs shuffle vs "this join matches almost nothing, stop".
    * Broder's k-min estimator over the merged sketch, all exact
    * integer arithmetic (`matches · est_union div union_k`), so the
    * approximation itself is oracled cross-engine like the other KMV
    * gates. Exact below k distinct keys per side.
    */
  def kmvKeyOverlap(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String, k: Int): DataFrame = {
    // numeric keys ride the Knuth mix directly (the oracle-pinned
    // path); any other type hashes its string form through the KR
    // fold first — a bare cast-to-long would turn every string/date
    // key into NULL and silently report zero overlap for a join that
    // matches everything. Null keys drop either way (the sketch
    // skips nulls), matching a join's null-never-matches semantics.
    def keyHash(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          mix32(col(c).cast(LongType))
        case _ => mix32(KrHashExpression.krHash(col(c).cast("string")))
      }
    def sk(df: DataFrame, c: String, out: String) =
      df.select(keyHash(df, c).as("mh"))
        .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as(out))
    sk(a, aKey, "__ska").crossJoin(sk(b, bKey, "__skb")) // two one-row frames
      .withColumn("__u", kmvMerge(col("__ska"), col("__skb"), k))
      .withColumn("__matches",
        size(filter(col("__u"), x =>
          array_contains(col("__ska"), x) && array_contains(col("__skb"), x)))
          .cast(LongType))
      .withColumn("__estu", kmvEstimate(col("__u"), k))
      .select(
        kmvEstimate(col("__ska"), k).as("est_distinct_a"),
        kmvEstimate(col("__skb"), k).as("est_distinct_b"),
        col("__matches").as("matches"),
        size(col("__u")).cast(LongType).as("union_k"),
        call_function("div", col("__matches") * col("__estu"),
          size(col("__u")).cast(LongType)).as("est_overlap"))
  }

  /** Pairwise group resemblance from KMV sketches — Broder's k-min
    * estimator: J(A, B) ≈ |{k smallest of A ∪ B} ∩ A ∩ B| / k. The
    * cross-corpus overlap diagnostic ("how much does source X's
    * shingle set overlap source Y's") that exact intersection can't
    * afford at 100 TB: each group reduces to its O(k) sketch in ONE
    * corpus pass (the same bounded aggregate as
    * [[kmvDistinctShingles]]), and the pairing then runs over
    * |groups|² sketch rows, never over data. The pair stage uses
    * higher-order array ops (interpreted, not codegen) deliberately:
    * it touches k-element arrays × group-pairs, thousands of values,
    * regardless of corpus size. Output is exact integer ppm —
    * `matches·10⁶ ∕ |union sketch|` (the merged sketch holds ≤ k
    * values; below k total distinct values it IS the union, making the
    * estimate exact) — all modular-integer arithmetic the DuckDB
    * oracle replays bit-for-bit.
    */
  def kmvPairwiseJaccard(
      df: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val sk = shingleHashes(df, groupCol, textCol, n)
      .groupBy(col(groupCol).as("g"))
      .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sk"))
    val pairs = sk.select(col("g").as("group_a"), col("sk").as("__ska"))
      .join(broadcast(sk.select(col("g").as("group_b"), col("sk").as("__skb"))),
        col("group_a") < col("group_b"))
    pairs
      .withColumn("__u", kmvMerge(col("__ska"), col("__skb"), k))
      .withColumn("__matches",
        size(filter(col("__u"), x =>
          array_contains(col("__ska"), x) && array_contains(col("__skb"), x)))
          .cast(LongType))
      .select(
        col("group_a"), col("group_b"),
        col("__matches").as("matches"),
        size(col("__u")).cast(LongType).as("union_k"),
        call_function("div",
          col("__matches") * lit(1000000L), size(col("__u")).cast(LongType))
          .as("jaccard_ppm"))
  }
}
