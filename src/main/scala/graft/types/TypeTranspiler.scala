package graft.types

import org.apache.spark.sql.types._

/** Source-column metadata as introspected from an Oracle data dictionary
  * (USER_TAB_COLUMNS left-joined to USER_COL_COMMENTS — reference:
  * cmd/tablemeta.go:74-90).
  *
  * @param avgColLen  AVG_COL_LEN statistic; drives the reference's
  *                   int-vs-bigint narrowing for scale-0 NUMBERs
  *                   (cmd/tablemeta.go:140-143).
  */
final case class ColumnMeta(
    name: String,
    dataType: String,
    charLength: Int,
    precision: Option[Int],
    scale: Option[Int],
    nullable: Boolean,
    default: Option[String],
    comment: Option[String],
    avgColLen: Option[Int],
    position: Int
)

/** A transpiled column: Catalyst type for the in-engine DataFrame plus the
  * target-dialect (MySQL-kernel) DDL type string.
  */
final case class TranspiledColumn(
    name: String,
    catalystType: DataType,
    targetDdlType: String,
    nullable: Boolean,
    defaultSql: Option[String],
    comment: Option[String]
)

/** Oracle→(Catalyst, MySQL DDL) type transpiler.
  *
  * Reproduces the reference's mapping table (cmd/tablemeta.go:133-158)
  * including its two non-standard semantics that Spark's stock
  * `OracleDialect` does not implement:
  *
  *  - scale-0 `NUMBER` narrowed to int vs bigint by the `AVG_COL_LEN`
  *    statistic (>= 6 → bigint) — cmd/tablemeta.go:140-143;
  *  - `DATA_SCALE > 30` clamped to `least(precision,30)-1` (the reference
  *    folds this into its dictionary SQL at cmd/tablemeta.go:74).
  *
  * Pure functions — runs driver-side over catalog metadata (≤ thousands of
  * columns), so no Catalyst Expression needed; the 100 TB row data never
  * passes through here.
  */
object TypeTranspiler {

  /** Max decimal scale the target dialect accepts (MySQL limit the
    * reference clamps to inside its dictionary query).
    */
  val MaxTargetScale = 30

  def clampPrecisionScale(precision: Option[Int], scale: Option[Int]): (Int, Int) = {
    val p = precision.getOrElse(38)
    val s0 = scale.getOrElse(0)
    val s = if (s0 > MaxTargetScale) math.min(p, MaxTargetScale) - 1 else s0
    (p, math.max(s, 0))
  }

  def transpile(c: ColumnMeta): TranspiledColumn = {
    val dt = c.dataType.toUpperCase
    val (catalyst, ddl): (DataType, String) = dt match {
      case "NUMBER" =>
        val (p, s) = clampPrecisionScale(c.precision, c.scale)
        if (c.precision.exists(_ > 0) && s > 0)
          (DecimalType(math.min(p, 38), math.min(s, 37)), s"decimal($p,$s)")
        else if (c.avgColLen.exists(_ >= 6)) (LongType, "bigint")
        else (IntegerType, "int")
      case "FLOAT" | "BINARY_FLOAT"  => (FloatType, "float")
      case "BINARY_DOUBLE"           => (DoubleType, "double")
      case "VARCHAR2" | "NVARCHAR2" | "UROWID" =>
        (StringType, s"varchar(${math.max(c.charLength, 1)})")
      case "CHAR" | "NCHAR"          => (StringType, s"char(${math.max(c.charLength, 1)})")
      case "DATE"                    => (TimestampType, "datetime") // Oracle DATE carries time-of-day
      case t if t.startsWith("TIMESTAMP") && t.contains("TIME ZONE") =>
        (TimestampType, "datetime(6)")
      case t if t.startsWith("TIMESTAMP") => (TimestampType, "datetime(6)")
      case "CLOB" | "NCLOB" | "LONG" => (StringType, "longtext")
      case "BLOB" | "RAW" | "LONG RAW" => (BinaryType, "longblob")
      case other                     => (StringType, other.toLowerCase) // passthrough verbatim
    }
    TranspiledColumn(
      c.name.toLowerCase,
      catalyst,
      ddl,
      c.nullable,
      c.default.flatMap(d => rewriteDefault(d, catalyst)),
      c.comment
    )
  }

  /** Default-value rewrite (reference: cmd/tablemeta.go:100-131):
    * strip wrapping parens/quotient noise; non-portable generators
    * (SYS_GUID(), USER) drop to NULL; SYSDATE / CURRENT_TIMESTAMP map to
    * current_timestamp; numeric defaults pass as the extracted literal.
    */
  def rewriteDefault(raw: String, target: DataType): Option[String] = {
    val trimmed0 = raw.trim
    val trimmed =
      if (trimmed0.startsWith("(") && trimmed0.endsWith(")"))
        trimmed0.substring(1, trimmed0.length - 1).trim
      else trimmed0
    val upper = trimmed.toUpperCase
    if (upper.isEmpty || upper == "NULL") None
    else if (upper.contains("SYS_GUID") || upper == "USER") None
    else if (upper.startsWith("SYSDATE") || upper.startsWith("CURRENT_TIMESTAMP") ||
      upper.startsWith("SYSTIMESTAMP") || upper.startsWith("LOCALTIMESTAMP")) {
      Some("CURRENT_TIMESTAMP")
    } else
      target match {
        case _: NumericType =>
          val m = "[-]?[0-9][0-9.]*".r.findFirstIn(trimmed)
          m
        case _ =>
          // keep quoted string literals verbatim; re-quote bare words
          if (trimmed.startsWith("'")) Some(trimmed)
          else Some(s"'${trimmed.replace("'", "''")}'")
      }
  }

  /** The same Oracle→MySQL DDL type mapping as [[transpile]], expressed
    * as a Catalyst `Column` over a dictionary DataFrame — the form the
    * reference uses when it folds the normalization into its dictionary
    * SQL (cmd/tablemeta.go:74: CASE/NVL/LEAST inside the query). Use
    * this when the catalog arrives as a DataFrame (JDBC dictionary scan)
    * and the mapping should ride along inside the scan's projection
    * instead of a driver-side collect.
    *
    * Column arguments are the dictionary column names; all may be null
    * except `dataType`.
    */
  def ddlTypeExpr(
      dataType: org.apache.spark.sql.Column,
      charLength: org.apache.spark.sql.Column,
      precision: org.apache.spark.sql.Column,
      scale: org.apache.spark.sql.Column,
      avgColLen: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val dt = upper(dataType)
    val sClamped = when(coalesce(scale, lit(0)) > MaxTargetScale,
      least(coalesce(precision, lit(38)), lit(MaxTargetScale)) - 1)
      .otherwise(coalesce(scale, lit(0)))
    val sc = greatest(sClamped, lit(0))
    when(dt === "NUMBER",
      when(coalesce(precision, lit(0)) > 0 && sc > 0,
        concat(lit("decimal("), coalesce(precision, lit(38)).cast("string"),
          lit(","), sc.cast("string"), lit(")")))
        .when(coalesce(avgColLen, lit(0)) >= 6, lit("bigint"))
        .otherwise(lit("int")))
      .when(dt.isin("FLOAT", "BINARY_FLOAT"), lit("float"))
      .when(dt === "BINARY_DOUBLE", lit("double"))
      .when(dt.isin("VARCHAR2", "NVARCHAR2", "UROWID"),
        concat(lit("varchar("), greatest(coalesce(charLength, lit(1)), lit(1)).cast("string"), lit(")")))
      .when(dt.isin("CHAR", "NCHAR"),
        concat(lit("char("), greatest(coalesce(charLength, lit(1)), lit(1)).cast("string"), lit(")")))
      .when(dt === "DATE", lit("datetime"))
      .when(dt.startsWith("TIMESTAMP"), lit("datetime(6)"))
      .when(dt.isin("CLOB", "NCLOB", "LONG"), lit("longtext"))
      .when(dt.isin("BLOB", "RAW", "LONG RAW"), lit("longblob"))
      .otherwise(lower(dataType))
  }

  /** [[rewriteDefault]] as a Catalyst `Column` (same rules, same order)
    * for dictionary-DataFrame pipelines: null result means "drop the
    * default". `isNumeric` selects the numeric-literal extraction branch
    * the way the driver-side form dispatches on the Catalyst type.
    */
  def defaultSqlExpr(
      raw: org.apache.spark.sql.Column,
      isNumeric: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val t0 = trim(raw)
    val t = when(t0.startsWith("(") && t0.endsWith(")"),
      trim(t0.substr(lit(2), length(t0) - 2))).otherwise(t0)
    val u = upper(t)
    when(u === "" || u === "NULL" || u.contains("SYS_GUID") || u === "USER",
      lit(null).cast("string"))
      .when(u.startsWith("SYSDATE") || u.startsWith("CURRENT_TIMESTAMP") ||
        u.startsWith("SYSTIMESTAMP") || u.startsWith("LOCALTIMESTAMP"),
        lit("CURRENT_TIMESTAMP"))
      .when(isNumeric, nullif(regexp_extract(t, "[-]?[0-9][0-9.]*", 0), lit("")))
      .otherwise(when(t.startsWith("'"), t)
        .otherwise(concat(lit("'"), regexp_replace(t, "'", "''"), lit("'"))))
  }

  /** Catalyst schema for a whole table's metadata. */
  def toStructType(cols: Seq[ColumnMeta]): StructType =
    StructType(cols.sortBy(_.position).map { c =>
      val t = transpile(c)
      StructField(t.name, t.catalystType, t.nullable)
    })

  /** Target-dialect CREATE TABLE statement (reference: the string assembly
    * in cmd/tablemeta.go:160-186). Identifier quoting uses backticks per
    * the MySQL-kernel target.
    */
  def createTableDdl(table: String, cols: Seq[ColumnMeta]): String = {
    val colDefs = cols.sortBy(_.position).map { c =>
      val t = transpile(c)
      val nullSql = if (t.nullable) "" else " not null"
      val defSql = t.defaultSql.map(d => s" default $d").getOrElse("")
      val commentSql =
        t.comment.map(cm => s" comment '${cm.replace("'", "''")}'").getOrElse("")
      s"`${t.name}` ${t.targetDdlType}$nullSql$defSql$commentSql"
    }
    s"create table `${table.toLowerCase}` (\n  ${colDefs.mkString(",\n  ")}\n)"
  }
}
