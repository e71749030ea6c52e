package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import java.util.concurrent.Executors

import graft.config.SyncConfig
import graft.sources.{SqlCapableSource, TableSource}
import graft.verify.Comparator

/** Per-table migration outcome (the reference's summary-report row,
  * cmd/root.go:139-200).
  */
final case class TableResult(
    table: String,
    rows: Long,
    seconds: Double,
    ok: Boolean,
    error: Option[String]
)

/** Full-migration driver — the Spark-native `startDataTransfer`
  * (reference: cmd/root.go:47-204). Tables migrate concurrently on a
  * bounded driver-side pool (the reference's `maxParallel` semaphore,
  * cmd/root.go:95-102); each table's copy is a single shuffle-free Spark
  * job: partitioned read → (type-preserving) → partitioned write. No
  * `collect`, no repartition — read partitioning flows straight into the
  * write, which is what keeps the data path embarrassingly parallel at
  * 100 TB.
  */
final class Migrator(
    spark: SparkSession,
    src: TableSource,
    dest: graft.sinks.TableDest,
    cfg: SyncConfig = SyncConfig(),
    logs: graft.sinks.RunLogs = graft.sinks.RunLogs.noop
) {

  /** String-destination conveniences: a plain path is a parquet
    * directory destination, the historical default.
    */
  def this(spark: SparkSession, src: TableSource, destDir: String,
      cfg: SyncConfig, logs: graft.sinks.RunLogs) =
    this(spark, src, graft.sinks.ParquetDest(destDir), cfg, logs)
  def this(spark: SparkSession, src: TableSource, destDir: String,
      cfg: SyncConfig) =
    this(spark, src, destDir, cfg, graft.sinks.RunLogs.noop)
  def this(spark: SparkSession, src: TableSource, destDir: String) =
    this(spark, src, destDir, SyncConfig())

  /** Cross-table concurrency: how many table-copy jobs run at once.
    * Within a job, parallelism is the scan's partition count.
    */
  private val tableConcurrency = math.max(1, math.min(cfg.maxParallel, 8))

  def copyTable(name: String): TableResult = {
    val t0 = System.nanoTime()
    try {
      // statement tagging for cancellation (reference: the /* goapp */
      // comment tag + kill loop, cmd/app.go:213-243): every job for this
      // table carries a job group; cancel(name) aborts just that table.
      spark.sparkContext.setJobGroup(s"graft-copy-$name",
        s"graft table copy: $name", interruptOnCancel = true)
      // custom extraction SQL replaces the table scan when configured
      // (reference S7: YAML tables: map, cmd/root.go:84-85)
      val df = (cfg.tables.get(name), src) match {
        case (Some(sqls), s: SqlCapableSource) if sqls.nonEmpty =>
          s.sqlSource(spark, sqls.head)
        case _ => src.table(spark, name)
      }
      // row count observed on the write itself — a post-write read-back
      // would re-scan the whole table (a second full pass at 100 TB)
      val obs = new org.apache.spark.sql.Observation(s"graft-copy-$name")
      val observed = df.observe(obs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
      dest.write(observed, name)
      val n = obs.get("rows").asInstanceOf[Long]
      TableResult(name, n, (System.nanoTime() - t0) / 1e9, ok = true, None)
    } catch {
      case e: Exception =>
        // reference: LogError(logDir, "errorTableData", ...) per failed
        // table (cmd/root.go:440,449,487,496)
        logs.error("errorTableData", name, e)
        TableResult(name, -1, (System.nanoTime() - t0) / 1e9, ok = false,
          Some(e.getMessage))
    } finally spark.sparkContext.clearJobGroup()
  }

  /** Cancel one in-flight table copy (Ctrl-C analog, per table). */
  def cancel(name: String): Unit =
    spark.sparkContext.cancelJobGroup(s"graft-copy-$name")

  /** Cancel everything this engine has in flight. */
  def cancelAll(): Unit = spark.sparkContext.cancelAllJobs()

  /** Copy every non-excluded table; returns the per-table report. */
  def run(): Seq[TableResult] =
    runTables(src.tableNamesExcluding(spark, cfg.exclude))

  /** Copy ONLY the tables named in the config's `tables:` map — the
    * reference's `-s` selFromYml mode (cmd/create.go:61-78,
    * cmd/root.go:84-85): each listed table is extracted with its custom
    * SQL (or a plain scan when none is given); unlisted tables are
    * untouched.
    */
  def runSelected(): Seq[TableResult] =
    runTables(cfg.tables.keys.toSeq.sorted)

  private def runTables(names: Seq[String]): Seq[TableResult] = {
    val pool = Executors.newFixedThreadPool(tableConcurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = names.map(n => Future(copyTable(n)))
      Await.result(Future.sequence(futs), Duration.Inf)
    } finally pool.shutdown()
  }

  /** The destination as a readable source — the same view [[compare]]
    * verifies through (JDBC destinations unpack ArrayCarrier columns
    * here, so a synced vector table reads back as `array<float>`).
    */
  def destSource: TableSource = dest.asSource

  /** Post-copy verification (reference `compareDb`). */
  def compare(): DataFrame = {
    val names = src.tableNamesExcluding(spark, cfg.exclude)
    Comparator.compareCounts(spark, src, dest.asSource, names,
      maxParallel = tableConcurrency)
  }

  /** Column-level cardinality verification of one synced table — the
    * third comparison tier after row counts ([[compare]]) and content
    * checksums: src and dest [[Comparator.exactColumnProfile]]s joined
    * per column. Counts and checksums can both pass while a lossy type
    * transpile collapses distincts; a NO row here names the damaged
    * column directly. Column names compare case-insensitively (the
    * destination engine may fold identifiers — Derby uppercases).
    */
  def compareProfile(name: String): DataFrame = {
    def lowered(df: DataFrame) = {
      val folded = df.schema.fieldNames
        .map(c => c.toLowerCase(java.util.Locale.ROOT))
      // two columns differing only in case would fold to duplicate
      // names — downstream that's an ambiguous-column analysis error
      // (or silently doubled join rows in profileDiff); fail up front
      // naming the collision instead
      val collisions = folded.groupBy(identity).collect {
        case (n, hits) if hits.length > 1 => n
      }
      require(collisions.isEmpty,
        s"cannot profile $name: column names collide under case folding " +
          s"(${collisions.toSeq.sorted.mkString(", ")}) — " +
          "rename the source columns to differ beyond case")
      df.select(df.schema.fieldNames.map(c =>
        org.apache.spark.sql.functions.col(c)
          .as(c.toLowerCase(java.util.Locale.ROOT))).toIndexedSeq: _*)
    }
    Comparator.profileDiff(
      lowered(src.table(spark, name)),
      lowered(dest.asSource.table(spark, name)))
  }
}
