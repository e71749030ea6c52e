package graft.plans

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational tail of every streaming
  * sink. [[graft.streaming.IncrementalSync.start]] and
  * [[graft.streaming.CorpusIngest.start]] write one `batch=<id>`
  * directory per micro-batch (idempotent replay), which at crawl
  * cadence accumulates thousands of kilobyte-scale parquet files; a
  * 100 TB table read through them pays a task per file and a namenode
  * round-trip per footer. Compaction rewrites the accumulated batches
  * into target-size files: read once, repartition to
  * ⌈bytes/targetFileBytes⌉, write once, atomically swap directories.
  *
  * Scale shape: ONE wide job. The read enumerates the existing files
  * (bytes measured from the file listing, not an estimate), the
  * repartition is the single shuffle (round-robin — compaction has no
  * key; callers who need co-location recompact through
  * [[ScaleJoins.writeBucketed]] instead), and the write lands in a
  * sibling temp directory that replaces the input only after success —
  * a failed compaction leaves the source untouched. Run it from ONE
  * coordinator per dataset (the swap is not concurrency-safe against
  * a second compactor or a writer appending mid-compaction; pause the
  * stream or point it at a new epoch directory first — the same
  * contract every table-maintenance job has).
  */
object Compaction {

  /** Sum of regular-file sizes under `dir` (recursive), via the Hadoop
    * FS of the active session — works on any filesystem Spark can read.
    */
  private def totalBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var sum = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && !f.getPath.getName.startsWith("_")) sum += f.getLen
    }
    sum
  }

  /** Compact the parquet dataset at `dir` in place. Returns
    * (filesBefore, filesAfter). `targetFileBytes` sizes the output
    * files from the MEASURED input bytes (parquet-to-parquet, so
    * compression ratio carries over ~1:1).
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20
  ): (Long, Long) = {
    require(targetFileBytes > 0)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFiles(p: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().isFile) n += 1 }
      n
    }
    val before = countFiles(path)
    val bytes = totalBytes(spark, dir)
    val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + "__compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir)
      .repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: src -> old, tmp -> src, drop old. The window between the
    // two renames is the only non-atomic instant; a reader racing it
    // sees a missing directory, never a half-written one
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction swap failed moving $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore
      throw new java.io.IOException(s"compaction swap failed installing $tmp")
    }
    fs.delete(old, true)
    (before, countFiles(path))
  }
}
