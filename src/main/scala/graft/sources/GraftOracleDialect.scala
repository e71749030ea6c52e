package graft.sources

import java.sql.Types
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Custom Oracle read dialect implementing the reference's type semantics
  * that Spark's stock OracleDialect does not (SURVEY.md §1.2 / §7.3):
  *
  *  - `NUMBER(p,s)` with s > 30 clamps the scale to `least(p,30)−1`
  *    (the reference folds this into its dictionary SQL,
  *    cmd/tablemeta.go:74);
  *  - scale-0 / unspecified NUMBER maps to LongType — the widest of the
  *    reference's int/bigint split. The `AVG_COL_LEN ≥ 6 ? bigint : int`
  *    narrowing (cmd/tablemeta.go:140-143) is a *statistics*-driven
  *    choice unavailable from JDBC ResultSet metadata; the catalog-driven
  *    path ([[graft.types.TypeTranspiler]]) applies it when dictionary
  *    stats are present, and this dialect stays at the safe wide type;
  *  - Oracle driver-specific codes: BINARY_FLOAT(100), BINARY_DOUBLE(101),
  *    TIMESTAMP WITH [LOCAL] TIME ZONE (-101/-102), ROWID → String.
  *
  * Runs inside Spark's JDBC read path (schema resolution + row
  * conversion), so the mapping applies to every partitioned scan with no
  * per-row cost. Register once per JVM via [[GraftOracleDialect.register]].
  */
object GraftOracleDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase.startsWith("jdbc:oracle")

  private val BinaryFloat = 100
  private val BinaryDouble = 101
  private val TimestampTz = -101
  private val TimestampLtz = -102

  /** Reference scale clamp: s > 30 → least(p,30)−1 (never negative). */
  def clampScale(precision: Int, scale: Int): Int =
    if (scale > 30) math.max(math.min(precision, 30) - 1, 0) else scale

  override def getCatalystType(
      sqlType: Int,
      typeName: String,
      size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder): Option[DataType] = sqlType match {
    case Types.NUMERIC | Types.DECIMAL =>
      val precision = size
      val scale = Option(md).flatMap { b =>
        val m = b.build()
        if (m.contains("scale")) Some(m.getLong("scale").toInt) else None
      }.getOrElse(0)
      if (precision <= 0 && scale <= 0) Some(LongType) // unspecified NUMBER
      else if (scale <= 0) {
        // integer-ish NUMBER: wide type (see scaladoc re AVG_COL_LEN)
        if (precision > 0 && precision < 10) Some(IntegerType) else Some(LongType)
      } else {
        val s = clampScale(precision, scale)
        Some(DecimalType(math.min(math.max(precision, 1), 38), math.min(s, 37)))
      }
    case BinaryFloat          => Some(FloatType)
    case BinaryDouble         => Some(DoubleType)
    case TimestampTz | TimestampLtz => Some(TimestampType)
    case Types.ROWID          => Some(StringType)
    case Types.LONGVARCHAR | Types.CLOB | Types.NCLOB => Some(StringType)
    case Types.BLOB | Types.LONGVARBINARY => Some(BinaryType)
    case _                    => None // defer to Spark defaults
  }

  /** Write-side mapping when this dialect is used as a sink (the engine
    * normally writes through the MySQL dialect; provided for symmetry).
    */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType    => Some(JdbcType("CLOB", Types.CLOB))
    case BinaryType    => Some(JdbcType("BLOB", Types.BLOB))
    case BooleanType   => Some(JdbcType("NUMBER(1)", Types.NUMERIC))
    case TimestampType => Some(JdbcType("TIMESTAMP(6)", Types.TIMESTAMP))
    case _             => None
  }

  def register(): Unit = JdbcDialects.registerDialect(this)
}
