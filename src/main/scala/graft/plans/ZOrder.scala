package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-dimensional data
  * skipping for the 100 TB lake. A single-column sorted write gives
  * parquet min/max pruning on that one column and nothing on any
  * other; interleaving the bits of per-column RANK buckets orders rows
  * along a space-filling curve, so each output file covers a small
  * hyper-rectangle of the key space and a point/range predicate on ANY
  * clustered column prunes most files from the scan (the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Rank buckets (quantile codes), not raw values: Morton interleaving
  * assumes the per-dimension codes spread uniformly over [0, 2^bits);
  * raw skewed values would collapse most rows onto a few curve
  * segments. The quantile boundaries come from one
  * `approx_percentile` pass (a mergeable sketch aggregate), and the
  * collect is 2^bits−1 doubles per column — driver-bounded by
  * construction, independent of row count.
  *
  * Scale shape: one sketch pass, then ONE exchange + in-partition sort
  * over the data — the same cost as the single-column sorted write it
  * replaces. The exchange partitions by an explicit bucket id derived
  * from the z-value (equal-width z ranges — the rank-bucket codes are
  * quantile-uniform per dimension by construction, so the joint z
  * spreads across the full curve range), NOT by `repartitionByRange`:
  * RangePartitioning's reservoir sampling evaluates the entire child
  * plan a second time just to pick boundaries — at 100 TB, a full
  * extra materialization of the table per clustered write. Caveat,
  * stated honestly: when the clustered dimensions are strongly
  * CORRELATED the joint z concentrates on a curve diagonal and
  * equal-width ranges leave some buckets empty (fewer, larger files —
  * up to ~√numFiles files in the perfectly-correlated 2-D worst case);
  * sampled range partitioning would rebalance that at the cost of the
  * second pass. Correlated dimensions are a mis-specified clustering
  * key anyway (either one subsumes the other), so the one-pass shape
  * takes precedence.
  *
  * Reference analog: none — the reference writes destination tables in
  * arrival order (cmd/tabledata.go); layout optimization is part of
  * the lake-scale extension surface.
  */
object ZOrder {

  /** One sketch pass for every column's rank-bucket boundaries:
    * 2^bits − 1 quantile cuts per column (a mergeable
    * `approx_percentile` aggregate; the collect is bounded by
    * construction, independent of row count).
    */
  def quantileBounds(
      df: DataFrame, cols: Seq[String], bits: Int): Seq[Seq[Double]] = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits($bits) x cols(${cols.size}) must fit a long")
    val nb = (1 << bits) - 1
    val qs = (1 to nb).map(i => i.toDouble / (1 << bits))
    val row = df
      .select(cols.map(c =>
        approx_percentile(col(c).cast("double"), typedLit(qs), lit(10000))
          .as(c)): _*)
      .head()
    cols.zipWithIndex.map { case (c, i) =>
      val bs = row.getSeq[Double](i)
      // approx_percentile of an all-null (or empty) column is NULL —
      // fail with the column named instead of an NPE deep in bucketCode
      require(bs != null,
        s"cannot z-order on column $c: no non-null values to bucket")
      bs
    }
  }

  /** Morton z-value from PRE-COMPUTED boundaries — the shared kernel of
    * [[zValue]] and [[zorderAppend]] (appends must code new rows with
    * the SAME boundaries the base layout used, or the two layouts'
    * z-values stop being comparable).
    */
  def zValueWith(cols: Seq[String], bits: Int, bounds: Seq[Seq[Double]]): Column = {
    val codes = cols.zip(bounds).map { case (c, bs) =>
      bucketCode(col(c).cast("double"), bs)
    }
    // interleave: bit b of code i lands at position b*|cols| + i
    val terms = for {
      b <- 0 until bits
      (code, i) <- codes.zipWithIndex
    } yield shiftleft(
      shiftright(code.cast("long"), b).bitwiseAND(lit(1L)),
      b * cols.size + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Morton z-value for `cols`, each rank-bucketed into 2^bits codes.
    * Null sorts first (bucket 0). Total z width = bits·|cols| ≤ 63.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column =
    zValueWith(cols, bits, quantileBounds(df, cols, bits))

  /** Hilbert curve value from PRE-COMPUTED boundaries — the same
    * rank-bucket codes as [[zValueWith]] through the native Skilling
    * kernel ([[graft.functions.HilbertIndexExpression]]) instead of
    * Morton interleave: consecutive curve positions always step ONE
    * bucket along ONE dimension, so a file holding a contiguous curve
    * range covers a tighter hyper-rectangle than Morton's bit-carry
    * jumps allow — measurably lower [[fileCoverage]] at the same file
    * count (ZOrderSpec pins the comparison).
    */
  def hilbertValueWith(cols: Seq[String], bits: Int, bounds: Seq[Seq[Double]]): Column = {
    val codes = cols.zip(bounds).map { case (c, bs) =>
      bucketCode(col(c).cast("double"), bs).cast("int")
    }
    // 2-D (the common clustered-write case) takes the scalar kernel —
    // no per-row CreateArray / scratch array (bit-identical mapping,
    // pinned by HilbertIndexExpressionSpec's grid equality)
    if (codes.size == 2)
      graft.functions.HilbertIndexExpression.hilbert2(codes(0), codes(1), bits)
    else
      graft.functions.HilbertIndexExpression.hilbertIndex(array(codes: _*), bits)
  }

  /** Curve dispatch shared by write/append/stats: the persisted layout
    * contract names its curve, so appends and audits always code rows
    * the way the base layout did.
    */
  private def curveValueWith(
      curve: String, cols: Seq[String], bits: Int, bounds: Seq[Seq[Double]]): Column =
    curve match {
      case "morton" => zValueWith(cols, bits, bounds)
      case "hilbert" => hilbertValueWith(cols, bits, bounds)
      case other => throw new IllegalArgumentException(
        s"unknown clustering curve '$other' (morton | hilbert)")
    }

  /** `#boundaries <= value` via the native binary-search kernel
    * ([[graft.functions.BucketCodeExpression]] + a `coalesce` for the
    * null → bucket 0 layout rule). Third implementation generation,
    * each forced by measurement: the `aggregate(boundaries, …)` HOF
    * was interpreted per row (10.7 s writes, round 12); its
    * nested-`when` replacement was codegen'd but weighed ~5 KB of
    * bytecode per column, and a single-use tree pushed the Hilbert
    * write's whole-stage method past HotSpot's 8000-byte JIT ceiling
    * (maxMethodCodeSize 10842 → interpreted bytecode, 1.7× the write
    * cost — Morton escaped only because its 6 reuses of each tree
    * tripped subexpression elimination into separate small methods).
    * The kernel is identical arithmetic in a ~40-byte call site; the
    * tree survives below as [[bucketCodeBuiltin]], the correctness
    * cross-check ZOrderSpec pins the kernel against.
    */
  private def bucketCode(v: Column, bs: Seq[Double]): Column =
    coalesce(
      graft.functions.BucketCodeExpression.bucketCode(v, bs), lit(0))

  /** The nested-`when` binary-search formulation [[bucketCode]]
    * replaced — kept as the cross-check (the VecDot/LSH builtin-twin
    * convention).
    */
  private[plans] def bucketCodeBuiltin(v: Column, bs: Seq[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(v >= bs(mid), go(mid + 1, hi)).otherwise(go(lo, mid))
      }
    when(v.isNull, lit(0)).otherwise(go(0, bs.length))
  }

  /** Write `df` parquet at `path`, clustered along the z-curve of
    * `cols` into `numFiles` balanced files. Content is byte-identical
    * to an unclustered write — only the row-to-file layout changes.
    */
  def zorderWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 6,
      curve: String = "morton"): Unit = {
    val bounds = quantileBounds(df, cols, bits)
    clusterInto(df, cols, bits, bounds, curve, numFiles, path)
    writeMeta(df.sparkSession, path, cols, bits, bounds, curve)
  }

  /** Partition-id proxies for an exact bucket→partition placement:
    * proxy(b) is the smallest non-negative int whose Spark partition
    * hash (Murmur3 seed 42 then non-negative mod — exactly
    * HashPartitioning's partitionIdExpression) lands on partition b of
    * n, so `repartition(n, proxyCol)` puts bucket b's rows in
    * partition b and nowhere else. Each output file therefore holds
    * ONE contiguous z range (what `repartitionByRange` produced)
    * without RangePartitioning's boundary-sampling pass, which
    * evaluates the whole child plan a second time. The search is a
    * driver-side loop over small ints — expected n·H(n) probes, microseconds
    * for any realistic file count.
    */
  private[plans] def hashProxies(n: Int): Array[Int] = {
    val out = Array.fill(n)(-1)
    var found = 0
    var v = 0
    while (found < n) {
      val p = java.lang.Math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42), n)
      if (out(p) < 0) { out(p) = v; found += 1 }
      v += 1
    }
    out
  }

  /** The clustered FRAME every write path shares: curve value from the
    * given boundaries, one hash exchange on the precomputed bucket id
    * (equal-width z ranges; [[hashProxies]] pins bucket b to partition
    * b so files stay contiguous curve segments), in-partition sort by
    * the full z. ONE evaluation of `df` — the `repartitionByRange` this
    * replaces ran the child twice (its RangePartitioner samples the
    * child to pick boundaries), a full extra materialization of the
    * input per clustered write.
    */
  private def clusteredByZ(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      bounds: Seq[Seq[Double]],
      curve: String,
      numFiles: Int): DataFrame = {
    val totalBits = bits * cols.size
    // bucket = floor(cell · numFiles / 2^zbb) over the top zbb z bits —
    // exact long arithmetic (cell < 2^30, numFiles an Int), monotone in
    // z, so bucket ranges are contiguous curve segments
    val zbb = math.min(totalBits, 30)
    val cell = shiftright(col("__z"), totalBits - zbb)
    val bucket = shiftright(cell * lit(numFiles.toLong), zbb)
    val proxies = hashProxies(numFiles)
    df.withColumn("__z", curveValueWith(curve, cols, bits, bounds))
      .withColumn("__p",
        element_at(typedLit(proxies.toSeq), (bucket + 1).cast("int")))
      .repartition(numFiles, col("__p"))
      .sortWithinPartitions("__z")
      .drop("__z", "__p")
  }

  /** The one clustered-write kernel every entry point shares: cluster
    * via [[clusteredByZ]] and land at `target`. Content is
    * byte-identical to an unclustered write — only row-to-file layout
    * changes.
    */
  private def clusterInto(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      bounds: Seq[Seq[Double]],
      curve: String,
      numFiles: Int,
      target: String): Unit =
    clusteredByZ(df, cols, bits, bounds, curve, numFiles)
      .write.mode("overwrite").parquet(target)

  /** [[zorderWrite]] along the Hilbert curve — same boundaries, same
    * one-sketch-pass + one-range-exchange cost, tighter per-file
    * hyper-rectangles. Appends, stats, staleness and recluster all
    * read the curve off the stored contract, so the whole lifecycle
    * works unchanged on either curve.
    */
  def hilbertWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 6): Unit =
    zorderWrite(df, cols, path, numFiles, bits, curve = "hilbert")

  /** The layout contract, persisted as a `_`-prefixed parquet side
    * table under the dataset dir (Spark's input listing skips it, so
    * plain reads of `path` never see it — the same side-table
    * convention the ANN indexes use for their quantizer/codebook):
    * one row per clustered column with its boundary array. Appends
    * ride this instead of re-deriving boundaries — re-deriving from a
    * batch would code the same value into a different bucket and
    * silently break z comparability between old and new files.
    */
  private def metaPath(path: String) = s"$path/_zorder_meta"

  private def writeMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cols: Seq[String],
      bits: Int,
      bounds: Seq[Seq[Double]],
      curve: String): Unit = {
    import spark.implicits._
    cols.zip(bounds).zipWithIndex
      .map { case ((c, bs), i) => (i, c, bits, bs, curve) }
      .toDF("idx", "column", "bits", "bounds", "curve")
      .coalesce(1)
      .write.mode("overwrite").parquet(metaPath(path))
  }

  private def readMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[String], Int, Seq[Seq[Double]], String) = {
    val df = spark.read.parquet(metaPath(path))
    val rows = df.orderBy("idx").collect()
    require(rows.nonEmpty, s"no z-order layout contract under $path")
    // contracts persisted before the curve column existed are Morton
    // by construction — persisted layouts must stay readable
    val curve =
      if (df.columns.contains("curve")) rows.head.getString(4) else "morton"
    (rows.map(_.getString(1)).toSeq, rows.head.getInt(2),
      rows.map(_.getSeq[Double](3)).toSeq, curve)
  }

  /** Append a batch to a z-ordered dataset, clustered along the STORED
    * layout contract — the epoch shape: each append pays one range
    * exchange of the batch only, never a rewrite of the base (the same
    * O(batch) policy as the ANN index appends riding their stored
    * quantizer). New files cluster within the batch, so point
    * predicates keep pruning them; rows outside the stored boundary
    * range pile into the edge buckets, which is exactly the drift
    * signal [[zorderStats]] reads and [[isStaleZorder]] decides on —
    * remediation is a full [[zorderWrite]] recluster with fresh
    * boundaries. `numFiles` has no default on purpose: it sets the
    * batch's whole write parallelism (a 1 here funnels the epoch
    * through one sorting task), so the caller must size it to the
    * batch like [[zorderWrite]]'s callers size theirs.
    */
  def zorderAppend(
      batch: DataFrame,
      path: String,
      numFiles: Int): Unit = {
    val (cols, bits, bounds, curve) = readMeta(batch.sparkSession, path)
    clusteredByZ(batch, cols, bits, bounds, curve, numFiles)
      .write.mode("append").parquet(path)
  }

  /** Does `path` carry a persisted layout contract yet? The streaming
    * sink asks this once per micro-batch to decide init vs append.
    */
  def hasLayout(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Establish a layout contract WITHOUT writing data: sketch
    * boundaries from `sample` (for a streaming sink, the first
    * non-empty epoch — the best view of the distribution available at
    * that moment) and persist them at `path`. Deterministic for a
    * given sample, so a replayed first epoch re-derives the identical
    * contract.
    */
  def zorderInit(
      sample: DataFrame,
      cols: Seq[String],
      path: String,
      bits: Int = 6,
      curve: String = "morton"): Unit =
    writeMeta(sample.sparkSession, path, cols, bits,
      quantileBounds(sample, cols, bits), curve)

  /** IDEMPOTENT epoch append — the streaming-sink form of
    * [[zorderAppend]]: the batch clusters along the ROOT-stored layout
    * contract exactly like a plain append, but lands in its own
    * `batch=<epochId>` partition directory with mode overwrite, so a
    * REPLAYED micro-batch (crash between sink write and offset commit)
    * overwrites its own epoch instead of double-appending rows — the
    * same `batch=` replay contract [[graft.streaming.CorpusIngest]]'s
    * flat sink has, now with clustered files. Readers see the dataset
    * through ordinary partition discovery (plus a `batch` provenance
    * column); point predicates prune within every epoch because each
    * epoch's files are curve-clustered; what accumulates is epoch
    * COUNT — the file-accumulation staleness [[isStaleZorder]] reads
    * and [[reclusterZorderEpochs]] repairs.
    */
  def zorderAppendEpoch(
      batch: DataFrame,
      path: String,
      epochId: Long,
      numFiles: Int): Unit = {
    val (cols, bits, bounds, curve) = readMeta(batch.sparkSession, path)
    clusterInto(batch, cols, bits, bounds, curve, numFiles,
      s"$path/batch=$epochId")
  }

  /** Row deletion for a z-order clustered dataset — the clustered twin
    * of [[Compaction.deleteWhere]]: the survivors are re-clustered
    * under the STORED contract AND the STORED boundaries (deletion
    * must not move the layout contract, exactly as the index deletes
    * never move their quantizers — a takedown is not a drift repair),
    * staged through the crash-safe swap. Point predicates prune the
    * same way before and after; only the rows are gone.
    *
    * @return (rowsBefore, rowsAfter)
    */
  def deleteWhereZorder(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      condition: Column,
      numFiles: Int): (Long, Long) = {
    // both counts observed ON the rewrite itself (the deleteWhere
    // shape) — legal now that the clustered rewrite evaluates its
    // input exactly once: the old repartitionByRange ran a separate
    // boundary-sampling pass that would have fired the observations
    // twice, so this path paid two extra count scans per delete
    val obsIn = org.apache.spark.sql.Observation(
      s"graft-zdelete-in-${java.util.UUID.randomUUID()}")
    val obsOut = org.apache.spark.sql.Observation(
      s"graft-zdelete-out-${java.util.UUID.randomUUID()}")
    val cnt = org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("n")
    Compaction.stagedParquetSwap(spark, path, "delete") { tmp =>
      // meta read INSIDE the staged block (the reclusterZorder rule)
      val (mcols, mbits, mbounds, mcurve) = readMeta(spark, path)
      // an epoch-partitioned sink dataset ([[zorderAppendEpoch]])
      // collapses its epochs on delete, like [[reclusterZorderEpochs]]
      // — the directory shape stays valid for the resuming stream
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val epochLayout = fs.listStatus(p).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
      val raw = spark.read.parquet(path).observe(obsIn, cnt)
      // SQL DELETE semantics (the Compaction.deleteWhere rule): only
      // predicate-TRUE rows delete; NULL-evaluating rows survive
      val survivors = (if (epochLayout) raw.drop("batch") else raw)
        .filter(!org.apache.spark.sql.functions.coalesce(
          condition, org.apache.spark.sql.functions.lit(false)))
        .observe(obsOut, cnt)
      clusterInto(survivors, mcols, mbits, mbounds, mcurve, numFiles,
        if (epochLayout) s"$tmp/batch=0" else tmp)
      writeMeta(spark, tmp, mcols, mbits, mbounds, mcurve)
    }
    (obsIn.get("n").asInstanceOf[Long], obsOut.get("n").asInstanceOf[Long])
  }

  /** [[reclusterZorder]] for an EPOCH-PARTITIONED clustered dataset
    * (the [[zorderAppendEpoch]] streaming-sink layout): collapse every
    * accumulated `batch=` epoch into ONE fresh layout with fresh
    * boundaries, staged through the same crash-safe swap — readers
    * never observe a partial layout, and a death between the install
    * renames recovers on re-run. The collapsed data lands as a single
    * `batch=0` epoch so the directory shape (and the sink's next
    * `batch=<id>` append) stays valid; the `batch` provenance column
    * is collapsed with the epochs — recluster deliberately forgets
    * arrival grouping, that is what it is for.
    */
  def reclusterZorderEpochs(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      numFiles: Int): Unit = {
    Compaction.stagedParquetSwap(spark, path, "zorder") { tmp =>
      // meta read INSIDE the staged block (the reclusterZorder rule):
      // crash triage must recover the dataset before this executes
      val (mcols, mbits, _, mcurve) = readMeta(spark, path)
      val data = spark.read.parquet(path).drop("batch")
      val bounds = quantileBounds(data, mcols, mbits)
      clusterInto(data, mcols, mbits, bounds, mcurve, numFiles, s"$tmp/batch=0")
      writeMeta(spark, tmp, mcols, mbits, bounds, mcurve)
    }
  }

  /** Layout health, one row per clustered column:
    *   - `avg_coverage` — mean per-file span fraction
    *     ([[fileCoverage]]): the probability a uniform point predicate
    *     reads a file; creeps up as appends accumulate files.
    *   - `edge_ppm` — fraction (ppm) of NON-NULL values whose
    *     stored-bucket code is the extreme 0 or 2^bits−1: distribution
    *     drift lands new rows OUTSIDE the stored boundary range, piling
    *     them here long before coverage notices (a uniform layout keeps
    *     ~2/2^bits ≈ 31 250 ppm at 6 bits). Nulls always code into
    *     bucket 0 — that's layout, not drift — so they are excluded
    *     from the count (the denominator stays all rows: a mostly-null
    *     column's few real values can't dominate its ppm).
    * One pass over the data plus the per-file min/max jobs.
    */
  def zorderStats(
      spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (cols, bits, bounds, _) = readMeta(spark, path)
    val cov = fileCoverage(spark, path, cols)
      .groupBy("column").agg(avg("coverage").as("avg_coverage"))
    val df = spark.read.parquet(path)
    val top = (1 << bits) - 1
    val edges = df.select(cols.zip(bounds).map { case (c, bs) =>
      val code = bucketCode(col(c).cast("double"), bs)
      // nulls code into bucket 0 for LAYOUT purposes, but they are not
      // drift: counting them here would keep a >10%-null column
      // permanently above edgePpmMax, flagging a staleness no recluster
      // can ever clear
      (col(c).cast("double").isNotNull && (code === 0 || code === top))
        .cast("long").as(c)
    }: _*)
      .agg(count(lit(1)).as("__n"),
        cols.map(c => sum(col(c)).as(c)).toIndexedSeq: _*)
      .head()
    val n = edges.getLong(0)
    import spark.implicits._
    val edgeDf = cols.zipWithIndex
      .map { case (c, i) =>
        (c, if (n == 0) 0L else edges.getLong(i + 1) * 1000000L / n) }
      .toDF("column", "edge_ppm")
    cov.join(edgeDf, Seq("column")).orderBy("column")
  }

  /** Recluster decision: stale when any clustered column's mean file
    * coverage exceeds `covMax` (too many files answer every point
    * query — file accumulation) or its edge-bucket share exceeds
    * `edgePpmMax` (stored boundaries no longer describe the data —
    * distribution drift). Both remediate the same way: a full
    * [[zorderWrite]] with fresh boundaries.
    *
    * `covMax` must sit ABOVE the layout's ideal: a z-range split into
    * `numFiles` chunks fixes ~log2(numFiles) leading interleaved bits,
    * so each dim's ideal per-file span is ≈ numFiles^(−1/|cols|) (and
    * the dims split unevenly when log2(numFiles) doesn't divide by
    * |cols| — the leading bits alternate dims, so one dim gets the
    * extra split). The 0.5 default suits ≥ 16 files on 2 dims (ideal
    * 0.25); an 8-file 2-dim layout idealizes at 0.5 on its
    * worse-split dim and needs a looser bound.
    */
  def isStaleZorder(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      covMax: Double = 0.5,
      edgePpmMax: Long = 100000L): Boolean =
    zorderStats(spark, path).collect().exists { r =>
      r.getDouble(1) > covMax || r.getLong(2) > edgePpmMax
    }

  /** Crash-safe full recluster of a LIVE z-ordered dataset — the
    * remediation [[isStaleZorder]] prescribes, staged through
    * [[Compaction.stagedParquetSwap]] so a reader never observes a
    * partial layout and a crash never loses data: fresh boundaries are
    * sketched from the current dataset and the clustered rewrite (data
    * + the `_zorder_meta` contract) lands in `<path>__zorder_tmp`
    * while the existing layout stays fully readable; the install is
    * rename(path → path__zorder_old), rename(tmp → path), drop old.
    * An exception rolls back to the original; a process death between
    * the renames leaves the original intact at `__zorder_old` and
    * re-running recovers it — the alternative, an in-place
    * `zorderWrite(mode=overwrite)` of the same path, holds a
    * data-loss-on-crash window for the entire rewrite, which at 100 TB
    * is hours. Same operational contract as compaction: one
    * maintenance job per dataset, writers paused.
    *
    * Clustering columns and bit width default to the STORED layout
    * contract (recluster means "same layout, fresh boundaries");
    * `numFiles` has no default for the same reason [[zorderWrite]]'s
    * doesn't — it sets the rewrite's whole parallelism and must be
    * sized to the data.
    */
  def reclusterZorder(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      numFiles: Int,
      cols: Seq[String] = Nil,
      bits: Int = 0): Unit = {
    Compaction.stagedParquetSwap(spark, path, "zorder") { tmp =>
      // meta is read INSIDE the staged block: the swap's crash triage
      // runs first, so a re-run after a mid-install death recovers the
      // dataset (and with it the stored contract) before this executes
      val (mcols, mbits, _, mcurve) = readMeta(spark, path)
      val useCols = if (cols.nonEmpty) cols else mcols
      val useBits = if (bits > 0) bits else mbits
      zorderWrite(spark.read.parquet(path), useCols, tmp, numFiles, useBits, mcurve)
    }
  }

  /** Skipping effectiveness of a written layout: for each data file and
    * each of `cols`, the fraction of the column's global [min, max]
    * span that the file's own [min, max] covers — the probability a
    * uniform point predicate on that column must read the file. A
    * clustered layout scores ≪ 1 on every clustered column; an
    * arrival-order layout scores ≈ 1.
    *
    * ONE distributed pass over the data: per-file min/max aggregate
    * grouped on `input_file_name()` (a driver loop issuing one job per
    * file would serialize at thousands of files — exactly the shape a
    * 100 TB layout audit has). The global span folds from the tiny
    * per-file frame (min of file mins / max of file maxes) — no
    * second data scan.
    */
  def fileCoverage(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cols: Seq[String]): DataFrame = {
    val whole = spark.read.parquet(path)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__lo"),
      max(col(c).cast("double")).as(s"${c}__hi")))
    // materialize the tiny per-file frame once (files × 2·cols rows):
    // both the span fold and the returned coverage read it without
    // re-scanning the data
    val per = whole
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val spanAggs = cols.flatMap(c => Seq(
      min(col(s"${c}__lo")).as(s"${c}__lo"),
      max(col(s"${c}__hi")).as(s"${c}__hi")))
    val span = per.select(spanAggs: _*).head()
    val covRows = cols.zipWithIndex.map { case (c, i) =>
      // min/max of an entirely-null column are NULL — possible after
      // zorderAppend batches, which ride the stored boundaries without
      // re-validating; fail with the column named (mirroring
      // quantileBounds' write-path guard) instead of an unexplained NPE
      require(!span.isNullAt(2 * i) && !span.isNullAt(2 * i + 1),
        s"cannot audit coverage on column $c: no non-null values in the dataset")
      val glo = span.getDouble(2 * i)
      val ghi = span.getDouble(2 * i + 1)
      val cov =
        if (ghi == glo) lit(1.0)
        else (col(s"${c}__hi") - col(s"${c}__lo")) / lit(ghi - glo)
      struct(lit(c).as("column"), cov.as("coverage"))
    }
    per
      .select(col("file"), explode(array(covRows: _*)).as("__c"))
      .select(col("file"), col("__c.column"), col("__c.coverage"))
  }
}
