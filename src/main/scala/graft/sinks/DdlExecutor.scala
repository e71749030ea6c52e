package graft.sinks

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One executed statement on the destination. Implementations throw on
  * failure; the executor above them does the accounting.
  */
trait StatementExecutor extends AutoCloseable {
  def execute(sql: String): Unit
  def close(): Unit = ()
}

object StatementExecutor {

  /** JDBC destination (the production path — reference `destDb.Exec`).
    * One connection, opened lazily on first statement and reused for the
    * whole run, keeps DDL ordered and session-scoped state (temp objects,
    * session settings) alive across statements; catalog DDL volume is
    * O(schema objects), so pooling would buy nothing. Call `close()`
    * when the run ends.
    */
  def jdbc(url: String, props: java.util.Properties): StatementExecutor =
    new StatementExecutor {
      private var conn: java.sql.Connection = null
      def execute(sql: String): Unit = synchronized {
        if (conn == null || conn.isClosed)
          conn = java.sql.DriverManager.getConnection(url, props)
        val st = conn.createStatement()
        try st.execute(sql)
        finally st.close()
      }
      override def close(): Unit = synchronized {
        if (conn != null && !conn.isClosed) conn.close()
        conn = null
      }
    }

  /** Recording stub for specs and plan-only runs. */
  final class Recording(failOn: String => Boolean = _ => false)
      extends StatementExecutor {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def execute(sql: String): Unit = synchronized {
      buf += sql
      if (failOn(sql)) throw new RuntimeException(s"injected failure: $sql")
    }
    def executed: Seq[String] = synchronized(buf.toSeq)
  }
}

/** Per-category execution outcome — the reference's report tuple
  * `(name, start, end, failedCount, cost)` returned by every creator
  * (cmd/tablemeta.go:172-186, 209-215, 254-275, 304-310, 347-353,
  * 382-388, 425-435).
  */
final case class CategoryReport(
    category: String,
    start: String,
    end: String,
    total: Int,
    failed: Int,
    seconds: Double
)

/** Object-DDL executor sink (K4/K5): runs generated DDL statements on
  * the destination with per-category failure accounting and K7 file
  * sinks — the Spark-side DDL frames are collected first because
  * catalog DDL is small by construction (one row per schema object) and
  * must execute in deterministic order on one connection; only the
  * *generation* of the DDL distributes ([[graft.objects.ObjectMigrator]]).
  *
  * `metaDataOnly = true` is the reference's `-m` flag: log every
  * statement to `createSql.log` but execute nothing (plan-only, K6).
  */
final class DdlExecutor(
    exec: StatementExecutor,
    logs: RunLogs = RunLogs.noop,
    metaDataOnly: Boolean = false
) {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Execute one category of DDL (e.g. "Index", "ForeignKey",
    * "NormalIndex", "Comment", "View"). Pass `orderCols` for
    * order-sensitive DDL: a distributed frame collects in partition
    * order, which varies across runs/cluster layouts — sorting makes
    * replays deterministic (e.g. `Seq("table_name", "sql_cmd")` keeps
    * each table's `create index` ahead of its dependent `alter`).
    */
  def executeCategory(
      category: String,
      ddl: DataFrame,
      sqlCol: String = "sql_cmd",
      orderCols: Seq[String] = Seq.empty
  ): CategoryReport = {
    val t0 = System.nanoTime()
    val start = LocalDateTime.now().format(fmt)
    val ordered = if (orderCols.isEmpty) ddl
      else ddl.orderBy(orderCols.map(org.apache.spark.sql.functions.col): _*)
    val stmts = ordered.select(sqlCol).collect().map(_.getString(0))
    var failed = 0
    stmts.foreach { sql =>
      logs.output("createSql", sql)
      if (!metaDataOnly) {
        // the reference tags every statement it issues (`/* goapp */`,
        // cmd/tablemeta.go:302) so its kill-loop can find them
        try exec.execute(s"/* graft */ $sql")
        catch {
          case e: Exception =>
            logs.error(s"${category}CreateFailed", sql, e)
            failed += 1
        }
      }
    }
    val end = LocalDateTime.now().format(fmt)
    val secs = (System.nanoTime() - t0) / 1e9
    logs.run(f"$category: ${stmts.length} statements, $failed failed, $secs%.3f s")
    CategoryReport(category, start, end, stmts.length, failed, secs)
  }

  /** Run every category in order; returns one report row per category
    * (the reference's summary table, cmd/create.go:88-101).
    */
  def executeAll(categories: Seq[(String, DataFrame)]): Seq[CategoryReport] =
    categories.map { case (name, df) => executeCategory(name, df) }
}

object DdlExecutor {

  /** Report rows as a DataFrame for display / parquet persistence. */
  def reportDf(spark: SparkSession, reports: Seq[CategoryReport]): DataFrame = {
    import spark.implicits._
    reports.toDF()
  }
}
