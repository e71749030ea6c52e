package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: edit-distance similarity join between two key
  * columns — the "same entity, dirty spelling" join every catalog
  * reconciliation needs and no equi-join can express.
  *
  * The result is EXACT: every pair with `levenshtein(l, r) <= maxDist`
  * and nothing else. Exactness survives the blocking because both
  * candidate generators are lossless by theorem, not by tuning
  * (Gravano et al., "Approximate String Joins in a Database (Almost)
  * for Free", VLDB 2001 — the q-gram count-filter bounds):
  *
  *  - an edit destroys at most `q` distinct q-grams, so strings within
  *    edit distance k share >= max(|Ga|,|Gb|) − k·q distinct grams;
  *  - therefore (prefix filter) when the grams of each key are laid in
  *    ONE shared total order, any qualifying pair shares a gram inside
  *    each key's first k·q+1 grams. The shared order here is
  *    rarest-first (document frequency over both sides, ties by gram),
  *    so the hottest grams — shared prefixes, boilerplate — are picked
  *    LAST and never block;
  *  - keys whose distinct-gram count is <= k·q on BOTH sides escape the
  *    gram bound entirely (the required overlap degenerates to 0) and
  *    route through a length-band fallback instead: |len(a) − len(b)|
  *    <= k within edit distance k, and bands of width k+1 put such
  *    lengths at most one band apart — three band equi-joins cover all
  *    of them. Short DISTINCT keys are a bounded population, so the
  *    bands stay small by construction.
  *
  * Scale shape (100 TB): blocking runs over DISTINCT keys, not rows —
  * ids re-attach at the end by equi-join. One vocabulary-bounded gram
  * document-frequency aggregate (map-side combined), one |keys|-keyed
  * collect of <= |key| gram structs, a prefix explode of <= k·q+1 rows
  * per key, the candidate equi-join on rare grams, and a codegen'd
  * `levenshtein` verify over candidates only. The brute cross product
  * exists in the ORACLE, never in the plan.
  */
object Linkage {

  /** Distinct q-grams of `key` in rarest-first order is built by the
    * caller; this is just the raw distinct-gram array (empty below
    * length q — such keys ride the short fallback).
    */
  private def distinctGrams(key: Column, q: Int): Column =
    when(length(key) < q, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(key) - (q - 1)),
        i => key.substr(i, lit(q)))))

  /** All pairs `(id_l, id_r, dist)` with
    * `levenshtein(leftKey, rightKey) <= maxDist`. Null keys never
    * match (dropped up front, the SQL-join convention).
    */
  def editDistanceJoin(
      left: DataFrame,
      leftId: String,
      leftKey: String,
      right: DataFrame,
      rightId: String,
      rightKey: String,
      maxDist: Int,
      q: Int = 2
  ): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    val kq = maxDist * q
    // the key frames and the gram-frequency table are each consumed by
    // several branches (prefixes, short filters, df joins) — pin them
    // so the "one bounded aggregate" in the scaladoc executes once,
    // not once per consumer (persistOnce: the duplicateClusters idiom
    // — repeated identical calls share one entry; LOOP callers with
    // changing inputs must release between iterations via their
    // cache-clear cadence, the CorpusIngest rule)
    def pin(frame: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
        frame, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keysL = pin(left.select(col(leftKey).as("__kl"))
      .filter(col("__kl").isNotNull).distinct())
    val keysR = pin(right.select(col(rightKey).as("__kr"))
      .filter(col("__kr").isNotNull).distinct())

    // shared rarest-first gram order: document frequency over the
    // distinct keys of BOTH sides (one bounded aggregate)
    val gramsL = keysL.select(col("__kl").as("__key"),
      explode(distinctGrams(col("__kl"), q)).as("__g"))
    val gramsR = keysR.select(col("__kr").as("__key"),
      explode(distinctGrams(col("__kr"), q)).as("__g"))
    val df = pin(gramsL.unionByName(gramsR)
      .groupBy("__g").agg(count(lit(1)).as("__df")))

    // per key: grams sorted by (df, gram), first kq+1 explode as the
    // blocking prefix (struct field order IS the sort order). Pinned:
    // in the SELF-join form the two sides' prefix plans canonicalize
    // identically, so one entry serves both — the whole
    // df-join + sort + slice chain ran twice per call before
    def prefix(grams: DataFrame): DataFrame = pin(grams
      .join(df, "__g")
      .groupBy("__key")
      .agg(slice(array_sort(collect_list(struct(col("__df"), col("__g")))),
        1, kq + 1).as("__pref"))
      .select(col("__key"), explode(col("__pref")).as("__p"))
      .select(col("__key"), col("__p.__g").as("__g")))

    val candGram = prefix(gramsL).withColumnRenamed("__key", "__kl")
      .join(prefix(gramsR).withColumnRenamed("__key", "__kr"), "__g")
      .select("__kl", "__kr")

    // short fallback: both sides' distinct-gram counts <= k·q — the
    // regime the gram bound cannot see; length bands of width k+1
    // cover |Δlen| <= k with one-band tolerance
    val shortL = keysL.filter(size(distinctGrams(col("__kl"), q)) <= kq)
    val shortR = keysR.filter(size(distinctGrams(col("__kr"), q)) <= kq)
    val bandR = shortR.withColumn("__band", (length(col("__kr")) / (maxDist + 1)).cast("long"))
    val candShort = shortL
      .withColumn("__b0", (length(col("__kl")) / (maxDist + 1)).cast("long"))
      .select(col("__kl"),
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)).as("__band"))
      .join(bandR, "__band")
      .select("__kl", "__kr")

    // the candidate dedup must act as a BARRIER: left lazy, the
    // optimizer pushes the `levenshtein <= maxDist` verify below the
    // distinct into the gram join's condition, where it runs once per
    // RAW gram collision — on a corpus whose keys share ubiquitous
    // grams that meant ~4x duplicated verifies concentrated in the two
    // hottest gram buckets (one task each). Pinning the deduped
    // candidate set materializes it first, so the codegen'd verify
    // runs exactly once per DISTINCT candidate pair, spread across the
    // session's cores.
    val verified = pin(candGram.unionByName(candShort).distinct())
      .withColumn("__dist", levenshtein(col("__kl"), col("__kr")).cast("long"))
      .filter(col("__dist") <= maxDist)

    // re-attach row ids on both sides (keys may repeat across rows)
    left.select(col(leftId).as("id_l"), col(leftKey).as("__kl"))
      .join(verified, "__kl")
      .join(right.select(col(rightId).as("id_r"), col(rightKey).as("__kr")), "__kr")
      .select(col("id_l"), col("id_r"), col("__dist").as("dist"))
  }

  /** Within-one-table near-dup pairs by edit distance: the self-join
    * form, each unordered pair once (`id_a < id_b`). Identical keys on
    * different rows report dist 0 — exact-dup detection rides along.
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int,
      q: Int = 2
  ): DataFrame =
    editDistanceJoin(df, idCol, keyCol, df, idCol, keyCol, maxDist, q)
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l").as("id_a"), col("id_r").as("id_b"), col("dist"))
}
