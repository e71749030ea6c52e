package graft.plans

/** A read-partition specification for one source table: either N disjoint
  * range predicates (parallel scan), a single full scan, or an explicit
  * empty scan for zero-row tables.
  */
sealed trait ScanPlan {
  def predicates: Array[String]
}

/** Disjoint split-column ranges covering the whole table. */
final case class RangeScan(column: String, bounds: Seq[(Long, Long)]) extends ScanPlan {
  // [lo, hi) half-open except the last page which is closed on hi to
  // cover the max key even when maxKey == hi.
  def predicates: Array[String] =
    bounds.zipWithIndex.map { case ((lo, hi), i) =>
      if (i == bounds.length - 1) s"$column >= $lo AND $column <= $hi"
      else s"$column >= $lo AND $column < $hi"
    }.toArray
}

/** Unsplittable table — one partition, whole table (correctness over
  * parallelism; the reference's ROWNUM pagination over an unordered scan
  * is a known correctness wart — SURVEY.md §7.4.6).
  */
case object FullScan extends ScanPlan {
  def predicates: Array[String] = Array("1 = 1")
}

/** Zero-row table: no read tasks at all (the reference instead emits a
  * synthetic `1=0` page — cmd/root.go:250-252 — so that DDL/compare still
  * see the table; our planner decouples those concerns).
  */
case object EmptyScan extends ScanPlan {
  def predicates: Array[String] = Array.empty
}

/** Pagination planner — the Spark-side replacement for the reference's
  * ROWNUM page planner (cmd/root.go:308-340). Instead of ROWNUM windows
  * (order-undefined under concurrency), we split on a numeric key's
  * [min,max] range into `ceil(rows/pageSize)`-ish disjoint predicates;
  * each predicate becomes one Spark JDBC read partition = one task,
  * matching the reference's one-goroutine-per-page granularity.
  *
  * At 100 TB the key property is that page count scales with data while
  * `maxParallel` (the connection budget) caps concurrent tasks — Spark's
  * scheduler queues the rest, so total source connections stay bounded
  * regardless of table size.
  */
object PartitionPlanner {

  /** Number of pages for `rows` rows at `pageSize` rows/page
    * (reference: `ceil(count/pageSize)`, cmd/root.go:320-326).
    */
  def pageCount(rows: Long, pageSize: Long): Int = {
    require(pageSize > 0, s"pageSize must be positive: $pageSize")
    if (rows <= 0) 0 else ((rows + pageSize - 1) / pageSize).toInt
  }

  /** Split [minKey, maxKey] into `n` contiguous ranges. Half-open
    * internally, closed at the top. Guarantees: ranges are disjoint,
    * sorted, and their union covers [minKey, maxKey] exactly.
    */
  def splitRange(minKey: Long, maxKey: Long, n: Int): Seq[(Long, Long)] = {
    require(n > 0, s"need at least one partition: $n")
    require(maxKey >= minKey, s"bad range [$minKey,$maxKey]")
    val span = maxKey - minKey + 1
    val parts = math.min(n.toLong, span).toInt
    val step = span / parts
    val rem = span % parts
    var lo = minKey
    (0 until parts).map { i =>
      val width = step + (if (i < rem) 1 else 0)
      val hi = lo + width // half-open
      val b = if (i == parts - 1) (lo, maxKey) else (lo, hi)
      lo = hi
      b
    }
  }

  /** Plan a table scan.
    *
    * @param rows      table cardinality (from a pushdown count)
    * @param pageSize  target rows per read partition
    * @param splitKey  numeric split column with its (min,max), if one exists
    * @param maxParallel cap on partition count (connection budget)
    */
  def plan(
      rows: Long,
      pageSize: Long,
      splitKey: Option[(String, Long, Long)],
      maxParallel: Int = 100
  ): ScanPlan = {
    if (rows <= 0) EmptyScan
    else {
      val pages = math.min(pageCount(rows, pageSize), math.max(maxParallel, 1))
      splitKey match {
        case Some((col, lo, hi)) if pages > 1 =>
          RangeScan(col, splitRange(lo, hi, pages))
        case _ => FullScan
      }
    }
  }
}
