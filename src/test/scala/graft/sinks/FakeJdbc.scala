package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** In-memory recording JDBC endpoint for exercising the PRODUCTION
  * source/sink path (JdbcSource, BatchWriter.writeJdbc,
  * writeJdbcRangeIdempotent) without a database: every statement Spark's
  * JDBC data source emits — probes, TRUNCATE/CREATE, prepared INSERTs,
  * batch executions, isolation/commit calls — lands in a global log the
  * specs assert on, and canned tables serve the read side (catalog scan
  * and partitioned range reads, with real predicate evaluation for the
  * planner's `k >= lo AND k < hi` pages).
  *
  * Built on dynamic proxies: only the methods Spark's JdbcUtils/JDBCRDD
  * actually call are given behavior; everything else gets a
  * type-appropriate default, so minor driver-surface changes across
  * Spark versions don't break the fake. Test-tree only — the shipped
  * library has no fake-driver dependency.
  */
object FakeJdbc {

  val Prefix = "jdbc:graftfake:"

  /** Dialect for the fake endpoint, modeling the reference's MySQL
    * destination where it matters to the write path: TRUNCATE is
    * non-cascading (so Overwrite+truncate actually truncates instead of
    * drop+create — Spark only engages truncate when the dialect commits
    * to `Some(false)`), and a failed existence probe means "object not
    * found" (Spark 4 RETHROWS probe failures unless the dialect
    * classifies them, so without this the create-on-missing path is
    * unreachable).
    */
  object Dialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url != null && url.startsWith(Prefix)
    override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
    override def isObjectNotFoundException(e: SQLException): Boolean = true
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(Dialect)

  final case class Col(name: String, sqlType: Int)

  /** name → (columns, rows). Table names are matched case-insensitively
    * (the JDBC source quotes identifiers; Oracle-style sources upcase).
    */
  @volatile private var tables: Map[String, (Seq[Col], Seq[Seq[Any]])] = Map.empty

  private val log = new ConcurrentLinkedQueue[String]()
  private val written = new ConcurrentLinkedQueue[Seq[Any]]()

  def statements: Seq[String] = log.asScala.toSeq
  def writtenRows: Seq[Seq[Any]] = written.asScala.toSeq

  def reset(tbls: Map[String, (Seq[Col], Seq[Seq[Any]])] = Map.empty): Unit = {
    tables = tbls
    log.clear()
    written.clear()
  }

  private def record(s: String): Unit = log.add(s)

  // ------------------------------------------------------------ proxies

  /** Reflective proxy with per-method overrides and type-correct
    * defaults for everything else.
    */
  private def proxy[T](
      iface: Class[T],
      name: String
  )(overrides: PartialFunction[(String, Array[AnyRef]), AnyRef]): T = {
    val h = new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, rawArgs: Array[AnyRef]): AnyRef = {
        val args = if (rawArgs == null) Array.empty[AnyRef] else rawArgs
        val key = (m.getName, args)
        if (overrides.isDefinedAt(key)) overrides(key)
        else m.getName match {
          case "toString" => s"FakeJdbc($name)"
          case "hashCode" => Int.box(System.identityHashCode(p))
          case "equals" => Boolean.box(p eq args(0))
          case "isWrapperFor" => Boolean.box(false)
          case "unwrap" => throw new SQLException(s"unwrap unsupported by $name")
          case _ =>
            m.getReturnType match {
              case java.lang.Boolean.TYPE => Boolean.box(false)
              case java.lang.Integer.TYPE => Int.box(0)
              case java.lang.Long.TYPE => Long.box(0L)
              case java.lang.Short.TYPE => Short.box(0)
              case java.lang.Byte.TYPE => Byte.box(0)
              case java.lang.Double.TYPE => Double.box(0.0)
              case java.lang.Float.TYPE => Float.box(0.0f)
              case _ => null
            }
        }
      }
    }
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), h).asInstanceOf[T]
  }

  // --------------------------------------------------------- connection

  def newConnection(): Connection = {
    record("CONNECT")
    lazy val conn: Connection = proxy(classOf[Connection], "connection") {
      case ("createStatement", _) => newStatement(None)
      case ("prepareStatement", args) if args.nonEmpty && args(0).isInstanceOf[String] =>
        record(s"PREPARE ${args(0)}")
        newStatement(Some(args(0).asInstanceOf[String]))
      case ("getMetaData", _) => dbMeta
      case ("setAutoCommit", args) =>
        record(s"SET AUTOCOMMIT ${args(0)}"); null
      case ("getAutoCommit", _) => Boolean.box(true)
      case ("setTransactionIsolation", args) =>
        record(s"SET ISOLATION ${args(0)}"); null
      case ("getTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("commit", _) => record("COMMIT"); null
      case ("rollback", _) => record("ROLLBACK"); null
      case ("close", _) => record("CLOSE CONNECTION"); null
      case ("isClosed", _) => Boolean.box(false)
      case ("isValid", _) => Boolean.box(true)
    }
    conn
  }

  private lazy val dbMeta: DatabaseMetaData =
    proxy(classOf[DatabaseMetaData], "dbmeta") {
      case ("supportsTransactions", _) => Boolean.box(true)
      case ("supportsTransactionIsolationLevel", _) => Boolean.box(true)
      case ("getDefaultTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("supportsDataManipulationTransactionsOnly", _) => Boolean.box(false)
      case ("supportsDataDefinitionAndDataManipulationTransactions", _) =>
        Boolean.box(true)
      case ("getDatabaseProductName", _) => "GraftFake"
      case ("getDriverName", _) => "graft-fake-jdbc"
      case ("getURL", _) => Prefix
    }

  // ---------------------------------------------------------- statement

  /** One proxy serves both Statement and PreparedStatement (Spark casts
    * to PreparedStatement for inserts, Statement for DDL).
    */
  private def newStatement(preparedSql: Option[String]): PreparedStatement = {
    val params = scala.collection.mutable.Map.empty[Int, Any]
    var batchCount = 0
    proxy(classOf[PreparedStatement], s"stmt(${preparedSql.getOrElse("-")})") {
      case ("executeQuery", args) =>
        val sql = if (args.nonEmpty) args(0).asInstanceOf[String]
          else preparedSql.getOrElse(throw new SQLException("no SQL"))
        record(s"QUERY $sql")
        resultSetFor(sql)
      case ("executeUpdate", args) =>
        val sql = if (args.nonEmpty) args(0).asInstanceOf[String]
          else preparedSql.getOrElse(throw new SQLException("no SQL"))
        record(s"UPDATE $sql")
        applyDdl(sql)
        Int.box(0)
      case ("execute", args) =>
        val sql = if (args.nonEmpty) args(0).asInstanceOf[String]
          else preparedSql.getOrElse(throw new SQLException("no SQL"))
        record(s"EXECUTE $sql")
        Boolean.box(false)
      case (setter, args) if setter.startsWith("set") && args.length >= 2 &&
          args(0).isInstanceOf[Integer] &&
          Set("setString", "setLong", "setInt", "setShort", "setByte",
            "setDouble", "setFloat", "setBoolean", "setBigDecimal",
            "setTimestamp", "setDate", "setBytes", "setObject", "setNull")(setter) =>
        params(args(0).asInstanceOf[Integer].intValue()) =
          if (setter == "setNull") null else args(1)
        null
      case ("addBatch", _) =>
        batchCount += 1
        written.add(params.toSeq.sortBy(_._1).map(_._2))
        null
      case ("executeBatch", _) =>
        record(s"EXECUTE BATCH n=$batchCount")
        val out = Array.fill(batchCount)(1)
        batchCount = 0
        out
      case ("clearBatch", _) => batchCount = 0; null
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
    }
  }

  // ---------------------------------------------------------------- ddl

  private val CreateTable = """(?is)\s*CREATE\s+TABLE\s+"?(\w+)"?\s*\((.*)\).*""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+"?(\w+)"?\s*""".r

  /** Honor CREATE/DROP like a real endpoint, so the schema probe Spark
    * runs AFTER a create-on-missing write resolves against the table it
    * just created (simple single-word types only — the write path emits
    * BIGINT/INTEGER/DOUBLE/TEXT for the frames these specs use).
    */
  private def applyDdl(sql: String): Unit = sql match {
    case CreateTable(name, colsDdl) =>
      val cols = colsDdl.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
        val m = """"?(\w+)"?\s+(\w+).*""".r
        c match {
          case m(colName, typeName) =>
            val t = typeName.toUpperCase match {
              case "BIGINT" => Types.BIGINT
              case "INTEGER" | "INT" => Types.INTEGER
              case "DOUBLE" | "FLOAT8" => Types.DOUBLE
              case _ => Types.VARCHAR // TEXT, VARCHAR, CLOB, ...
            }
            Col(colName, t)
          case _ => throw new SQLException(s"fake cannot parse column DDL: $c")
        }
      }
      tables = tables + (name -> (cols, Seq.empty))
    case DropTable(name) =>
      tables = tables - name
    case _ => () // TRUNCATE, DELETE, ... — no fake state to change
  }

  // --------------------------------------------------------- result set

  /** Route a query to canned data: the catalog scan (`user_tables`),
    * schema probes (`1=0`), and table reads with planner predicates.
    */
  private def resultSetFor(sql: String): ResultSet = {
    val lower = sql.toLowerCase
    val isProbe = lower.replace(" ", "").contains("1=0") ||
      lower.replace(" ", "").contains("0=1")
    if (lower.contains("user_tables")) {
      val cols = Seq(Col("table_name", Types.VARCHAR))
      val rows = if (isProbe) Seq.empty else tables.keys.toSeq.sorted.map(Seq(_))
      newResultSet(cols, rows)
    } else {
      // longest name first, so `emp` never shadows `emp_out`
      tables.toSeq.sortBy(-_._1.length).collectFirst {
        case (name, (cols, rows)) if lower.contains(name.toLowerCase) =>
          if (isProbe) newResultSet(cols, Seq.empty)
          else newResultSet(cols, filterRows(cols, rows, sql))
      }.getOrElse(throw new SQLException(s"no such fake table for: $sql"))
    }
  }

  private val RangePred =
    """(?i).*WHERE\s*\(?\s*(\w+)\s*>=\s*(-?\d+)\s+AND\s+\1\s*(<=?)\s*(-?\d+).*""".r
  private val LowerOnly =
    """(?i).*WHERE\s*\(?\s*(\w+)\s*>=\s*(-?\d+)\s*\)?\s*$""".r

  /** Evaluate the planner's page predicates (`k >= lo AND k < hi`,
    * closed on the last page) so partitioned reads return DISJOINT
    * pages — the spec's exact-cover assertion is then real evidence,
    * not an artifact of the fake returning everything to everyone.
    */
  private def filterRows(cols: Seq[Col], rows: Seq[Seq[Any]], sql: String): Seq[Seq[Any]] =
    sql match {
      case RangePred(colName, lo, op, hi) =>
        val idx = cols.indexWhere(_.name.equalsIgnoreCase(colName))
        if (idx < 0) throw new SQLException(s"predicate column $colName not in fake table")
        val (l, h) = (lo.toLong, hi.toLong)
        rows.filter { r =>
          val v = r(idx).asInstanceOf[Number].longValue()
          v >= l && (if (op == "<=") v <= h else v < h)
        }
      case LowerOnly(colName, lo) =>
        val idx = cols.indexWhere(_.name.equalsIgnoreCase(colName))
        rows.filter(_(idx).asInstanceOf[Number].longValue() >= lo.toLong)
      case _ => rows
    }

  private def newResultSet(cols: Seq[Col], rows: Seq[Seq[Any]]): ResultSet = {
    var cursor = -1
    var lastWasNull = false
    def cell(i: Int): Any = {
      val v = rows(cursor)(i - 1)
      lastWasNull = v == null
      v
    }
    proxy(classOf[ResultSet], "resultset") {
      case ("next", _) =>
        cursor += 1
        Boolean.box(cursor < rows.size)
      case ("getMetaData", _) => rsMeta(cols)
      case ("getString", args) =>
        val v = cell(args(0).asInstanceOf[Integer])
        if (v == null) null else v.toString
      case ("getLong", args) =>
        val v = cell(args(0).asInstanceOf[Integer])
        Long.box(if (v == null) 0L else v.asInstanceOf[Number].longValue())
      case ("getInt", args) =>
        val v = cell(args(0).asInstanceOf[Integer])
        Int.box(if (v == null) 0 else v.asInstanceOf[Number].intValue())
      case ("getDouble", args) =>
        val v = cell(args(0).asInstanceOf[Integer])
        Double.box(if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue())
      case ("getObject", args) => cell(args(0).asInstanceOf[Integer]).asInstanceOf[AnyRef]
      case ("wasNull", _) => Boolean.box(lastWasNull)
      case ("isClosed", _) => Boolean.box(false)
      case ("close", _) => null
    }
  }

  private def rsMeta(cols: Seq[Col]): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData], "rsmeta") {
      case ("getColumnCount", _) => Int.box(cols.size)
      case ("getColumnName", args) => cols(args(0).asInstanceOf[Integer] - 1).name
      case ("getColumnLabel", args) => cols(args(0).asInstanceOf[Integer] - 1).name
      case ("getColumnType", args) => Int.box(cols(args(0).asInstanceOf[Integer] - 1).sqlType)
      case ("getColumnTypeName", args) =>
        cols(args(0).asInstanceOf[Integer] - 1).sqlType match {
          case Types.VARCHAR => "VARCHAR"
          case Types.BIGINT => "BIGINT"
          case Types.INTEGER => "INTEGER"
          case Types.DOUBLE => "DOUBLE"
          case _ => "OTHER"
        }
      case ("getPrecision", _) => Int.box(0)
      case ("getScale", _) => Int.box(0)
      case ("isSigned", _) => Boolean.box(true)
      case ("isNullable", _) => Int.box(ResultSetMetaData.columnNullable)
    }
}

/** The registrable driver class: `option("driver",
  * "graft.sinks.FakeJdbcDriver")` or DriverManager registration both
  * work (Spark falls back to `DriverManager.getDriver(url)` when no
  * driver class is configured).
  */
class FakeJdbcDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(FakeJdbc.Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else FakeJdbc.newConnection()
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException()
}
