package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark lacks as built-ins, expressed as
  * single-shuffle declarative plans.
  */
object Temporal {

  /** Backward as-of join (point-in-time join): for every left row,
    * attach the LATEST right row of the same key with
    * `right.ts <= left.ts` — the lookup every feature-backfill and
    * trade/quote pipeline needs, and one Spark has no operator for.
    *
    * Shape: tag both sides, union, ONE window over (key) ordered by
    * (ts, side) carrying the last-seen right payload forward, keep left
    * rows. One hash shuffle on the key + an in-partition sort — the
    * same cost as a single join, regardless of how many right rows
    * precede each left row (a naive `l.ts >= r.ts` range join explodes
    * to O(|L|·|R|/keys) pairs and then re-aggregates; this never
    * materializes them). Ties (`right.ts == left.ts`) match, like SQL
    * `ASOF JOIN ... ON l.ts >= r.ts`; rows with no earlier right row
    * get nulls (left-outer semantics).
    *
    * The right side must be unique per (key, ts) — pre-aggregate
    * otherwise, or the carried payload is whichever duplicate sorted
    * last. NULL timestamps have no position on the time axis: right
    * rows with a null ts never match, left rows with a null ts get the
    * no-match nulls (identically in both scan directions).
    *
    * @param rightValueCols right columns to carry onto left rows
    * @param prefix         carried columns are named `prefix + name`
    *                       (the right timestamp lands as `prefix +
    *                       rightTsCol`)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame =
    asofImpl(left, right, keyCol, leftTsCol, rightTsCol, rightValueCols,
      prefix, forward = false)

  /** Forward as-of join: for every left row, attach the EARLIEST right
    * row of the same key with `right.ts >= left.ts` — the mirror of
    * [[asofJoin]], and the other half every event pipeline eventually
    * needs ("the next click after each impression", "time-to-first-
    * response"). Identical single-shuffle union+window shape; only the
    * scan direction of the window flips, so cost and contracts
    * (unique right per (key, ts), left-outer nulls, ties match) carry
    * over unchanged.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame =
    asofImpl(left, right, keyCol, leftTsCol, rightTsCol, rightValueCols,
      prefix, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String],
      prefix: String,
      forward: Boolean
  ): DataFrame = {
    val payload = struct(
      (col(rightTsCol).as(rightTsCol) +: rightValueCols.map(col)): _*)
    val payloadType = right.select(payload.as("__r")).schema("__r").dataType

    val lTagged = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    // right rows become null-padded left rows (keeping their key, which
    // both sides must name identically) so the union lines up. A right
    // row with a NULL timestamp has no position on the time axis and
    // can never legitimately be "the latest at-or-before" anything —
    // without this filter the backward window's nulls-first ordering
    // carried it as a spurious match while the forward ordering
    // (nulls-last) did not, making the two mirrored operators disagree
    val rTagged = right
      .filter(col(rightTsCol).isNotNull)
      .select(
        left.schema.fields.map { f =>
          if (f.name == keyCol) col(keyCol).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq ++
          Seq(col(rightTsCol).as("__ts"), lit(0).as("__side"), payload.as("__r")): _*)

    // backward scans ts ascending, forward descending; either way the
    // right row sorts before the left at equal ts, so ties match
    // (ASOF >= backward, ASOF <= forward), and last-seen-right at each
    // left row is the nearest match in the scan direction
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side"))
      else Seq(col("__ts"), col("__side"))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.union(rTagged)
      // a LEFT row with a NULL timestamp has no as-of position either:
      // force the no-match row rather than whatever the null happened
      // to sort next to (nulls-first vs nulls-last differs by
      // direction, and neither is a temporal answer)
      .withColumn("__asof",
        when(col("__ts").isNull, lit(null).cast(payloadType))
          .otherwise(last(col("__r"), ignoreNulls = true).over(w)))

    val outCols = left.columns.map(col).toSeq ++
      (rightTsCol +: rightValueCols).map(c =>
        col(s"__asof.$c").as(s"$prefix$c"))
    carried.filter(col("__side") === 1).select(outCols: _*)
  }

  /** Fixed-step gap fill (time-series regularization): one row per
    * `stepUs` bucket per key, spanning the key's own [min, max]
    * observation range, each bucket carrying the latest observation
    * at-or-before its instant forward ([[asofJoin]] semantics, so a
    * bucket before the key's first observation — only the aligned
    * leading bucket can be — fills with nulls). Bucket instants are
    * multiples of `stepUs`, so grids of different keys line up for
    * downstream joins. The classic "resample to an even grid +
    * forward-fill" every feature-store and monitoring pipeline needs,
    * and Spark has no operator for.
    *
    * Cost shape: one partial+final agg for per-key bounds, the grid
    * generates distributedly via sequence+explode (no driver loop, no
    * cross join), then ONE [[asofJoin]] shuffle. A key whose span/step
    * exceeds `maxBucketsPerKey` fails loudly via `raise_error` before
    * the explode — a mis-set step (seconds where you meant hours) at
    * 100 TB would otherwise quietly materialize billions of grid rows
    * per key. Timestamps must be non-negative epoch integers (the
    * bucket arithmetic uses integer division; the μs-since-epoch grain
    * every other temporal operator here uses).
    *
    * The observations must be unique per (key, ts) — same
    * pre-aggregation contract as [[asofJoin]]'s right side.
    */
  def gapFill(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      valueCols: Seq[String],
      stepUs: Long,
      maxBucketsPerKey: Long = 10_000_000L
  ): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsUsCol)).as("__lo"), max(col(tsUsCol)).as("__hi"))
      .withColumn("__b0", expr(s"__lo div ${stepUs}L"))
      .withColumn("__b1", expr(s"__hi div ${stepUs}L"))
    val guarded = bounds.withColumn("__b1",
      when(col("__b1") - col("__b0") >= maxBucketsPerKey,
        expr(s"raise_error(concat('gapFill: key ', cast(`$keyCol` as string), " +
          s"' spans more than $maxBucketsPerKey buckets at stepUs=$stepUs'))")
          .cast("long"))
        .otherwise(col("__b1")))
    val grid = guarded
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("__b"))
      .select(col(keyCol), (col("__b") * stepUs).as("bucket_us"))
    asofJoin(grid, df.select((keyCol +: tsUsCol +: valueCols).map(col): _*),
      keyCol, "bucket_us", tsUsCol, valueCols, prefix = "fill_")
  }

  /** Binned range join: match point rows to interval rows of the same
    * key with `start <= point <= end`. A naive inequality join has no
    * equi-key, so Spark plans a nested-loop — O(|P|·|I|) per key. This
    * buckets the domain into `binWidth`-sized bins: each point lands in
    * exactly ONE bin, each interval replicates to the bins it covers,
    * and the match becomes an ordinary (key, bin) hash join + exact
    * filter. Each qualifying pair meets exactly once (the point's bin
    * is unique), so no dedup pass is needed.
    *
    * Size `binWidth` near the typical interval length: replication is
    * `len/binWidth + 1` per interval, candidate pairs per bin shrink as
    * bins narrow — the same trade Databricks' range-join hints and
    * KDB's window joins make. Correct for negative domains too:
    * integer `div` is monotone, so a covered point's bin always lies in
    * the interval's bin range.
    *
    * @return all point columns + interval columns (key deduplicated)
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"`$pointCol` div ${binWidth}L"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$startCol` div ${binWidth}L"),
        expr(s"`$endCol` div ${binWidth}L"))))
    p.join(i, Seq(keyCol, "__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
