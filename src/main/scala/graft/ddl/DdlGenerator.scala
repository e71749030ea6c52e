package graft.ddl

import org.apache.spark.sql.types._

/** Target-dialect (MySQL-kernel) DDL from a Catalyst schema — the
  * result-set-driven DDL path (the reference's probe-based schema
  * discovery, cmd/root.go:277-303, feeding its CREATE TABLE assembly
  * at cmd/tablemeta.go:160-186). The catalog-driven path with Oracle
  * dictionary metadata lives in [[graft.types.TypeTranspiler]].
  */
object DdlGenerator {

  /** Catalyst type → MySQL column type. */
  def toMysqlType(dt: DataType): String = dt match {
    case ByteType                => "tinyint"
    case ShortType               => "smallint"
    case IntegerType             => "int"
    case LongType                => "bigint"
    case FloatType               => "float"
    case DoubleType              => "double"
    case d: DecimalType          => s"decimal(${d.precision},${d.scale})"
    case BooleanType             => "tinyint(1)"
    case DateType                => "date"
    case TimestampType           => "datetime(6)"
    case TimestampNTZType        => "datetime(6)"
    case BinaryType              => "longblob"
    case StringType              => "longtext"
    case _: ArrayType | _: MapType | _: StructType => "json"
    case other                   => other.simpleString
  }

  def createTable(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nullSql = if (f.nullable) "" else " not null"
      s"`${f.name.toLowerCase}` ${toMysqlType(f.dataType)}$nullSql"
    }
    s"create table `${table.toLowerCase}` (\n  ${cols.mkString(",\n  ")}\n)"
  }

  def dropTable(table: String): String =
    s"drop table if exists `${table.toLowerCase}`"
}

/** Execution/plan-only sink for generated DDL (reference K4/K6: execute
  * on target, or append to createSql.log under `-m`).
  */
final class DdlScript {
  private val statements = scala.collection.mutable.ArrayBuffer.empty[String]
  def add(sql: String): Unit = synchronized { statements += sql }
  def all: Seq[String] = synchronized(statements.toSeq)
  def writeTo(path: String): Unit = {
    val body = all.map(s => s.stripSuffix(";") + ";").mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body + "\n")
  }
}
