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
  * Scale shape: one sketch pass, then one range-partitioning exchange
  * on the z-value (`repartitionByRange` samples the z distribution, so
  * output files are balanced even when the curve is dense in one
  * corner) with an in-partition sort — the same cost as the
  * single-column sorted write it replaces.
  *
  * Reference analog: none — the reference writes destination tables in
  * arrival order (cmd/tabledata.go); layout optimization is part of
  * the lake-scale extension surface.
  */
object ZOrder {

  /** Morton z-value for `cols`, each rank-bucketed into 2^bits codes.
    * Null sorts first (bucket 0). Total z width = bits·|cols| ≤ 63.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits($bits) x cols(${cols.size}) must fit a long")
    val nb = (1 << bits) - 1
    val qs = (1 to nb).map(i => i.toDouble / (1 << bits))
    // one sketch pass for every column's quantile boundaries
    val bounds = df
      .select(cols.map(c =>
        approx_percentile(col(c).cast("double"), typedLit(qs), lit(10000))
          .as(c)): _*)
      .head()
    val codes = cols.zipWithIndex.map { case (c, i) =>
      bucketCode(col(c).cast("double"), bounds.getSeq[Double](i))
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

  /** `#boundaries <= value` as a BALANCED nested-`when` binary search
    * (depth log2 of the boundary count, ~6 codegen'd comparisons per
    * row at 6 bits). The obvious `aggregate(boundaries, 0, acc + ...)`
    * fold is a higher-order function — Catalyst interprets those row
    * by row (CodegenFallback), and at 6 bits that meant 63 interpreted
    * lambda calls per row per column: the soak measured the whole
    * z-order write at 10.7 s for 600 k rows before this tree, ~3× the
    * heaviest ANN query. Null (and below-all-cuts) lands in bucket 0.
    */
  private def bucketCode(v: Column, bs: Seq[Double]): Column = {
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
      bits: Int = 6): Unit = {
    val z = zValue(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Skipping effectiveness of a written layout: for each data file and
    * each of `cols`, the fraction of the column's global [min, max]
    * span that the file's own [min, max] covers — the probability a
    * uniform point predicate on that column must read the file. A
    * clustered layout scores ≪ 1 on every clustered column; an
    * arrival-order layout scores ≈ 1. One Spark job per file (the file
    * list is the driver-bounded unit of work here, as in
    * [[Compaction]]'s triage).
    */
  def fileCoverage(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val whole = spark.read.parquet(path)
    val span = whole.select(cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__lo"),
      max(col(c).cast("double")).as(s"${c}__hi"))): _*).head()
    val files = whole.inputFiles.sorted
    val rows = files.flatMap { f =>
      val per = spark.read.parquet(f).select(cols.flatMap(c => Seq(
        min(col(c).cast("double")).as("lo"),
        max(col(c).cast("double")).as("hi"))): _*).head()
      cols.zipWithIndex.map { case (c, i) =>
        val glo = span.getDouble(2 * i)
        val ghi = span.getDouble(2 * i + 1)
        val flo = per.getDouble(2 * i)
        val fhi = per.getDouble(2 * i + 1)
        val cov = if (ghi == glo) 1.0 else (fhi - flo) / (ghi - glo)
        (f, c, cov)
      }
    }
    rows.toSeq.toDF("file", "column", "coverage")
  }
}
