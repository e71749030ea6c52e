package graft.sources

import java.sql.Types
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class GraftOracleDialectSpec extends AnyFunSuite {

  private def catalyst(sqlType: Int, precision: Int = 0, scale: Option[Int] = None,
      typeName: String = "") = {
    val md = new MetadataBuilder()
    scale.foreach(s => md.putLong("scale", s.toLong))
    GraftOracleDialect.getCatalystType(sqlType, typeName, precision, md)
  }

  test("url routing") {
    assert(GraftOracleDialect.canHandle("jdbc:oracle:thin:@//h:1521/db"))
    assert(!GraftOracleDialect.canHandle("jdbc:mysql://h/db"))
  }

  test("NUMBER(p,s) maps to decimal with reference scale clamp") {
    assert(catalyst(Types.NUMERIC, 10, Some(2)) === Some(DecimalType(10, 2)))
    // s > 30: least(p,30)-1
    assert(catalyst(Types.NUMERIC, 38, Some(35)) === Some(DecimalType(38, 29)))
    assert(catalyst(Types.NUMERIC, 20, Some(31)) === Some(DecimalType(20, 19)))
  }

  test("integer-ish NUMBER: int for p<10, bigint otherwise, wide when unspecified") {
    assert(catalyst(Types.NUMERIC, 5, Some(0)) === Some(IntegerType))
    assert(catalyst(Types.NUMERIC, 19, Some(0)) === Some(LongType))
    assert(catalyst(Types.NUMERIC) === Some(LongType))
  }

  test("oracle-specific codes") {
    assert(catalyst(100) === Some(FloatType))   // BINARY_FLOAT
    assert(catalyst(101) === Some(DoubleType))  // BINARY_DOUBLE
    assert(catalyst(-101) === Some(TimestampType)) // TS WITH TZ
    assert(catalyst(-102) === Some(TimestampType)) // TS WITH LOCAL TZ
    assert(catalyst(Types.ROWID) === Some(StringType))
    assert(catalyst(Types.CLOB) === Some(StringType))
    assert(catalyst(Types.BLOB) === Some(BinaryType))
  }

  test("unknown types defer to Spark defaults") {
    assert(catalyst(Types.VARCHAR) === None)
  }

  test("registered dialect wins for oracle urls (aggregated, ours first)") {
    GraftOracleDialect.register()
    val resolved = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:oracle:thin:@//h:1521/db")
    // behavior check: the reference scale clamp applies through the
    // (possibly aggregated) resolved dialect — stock OracleDialect
    // would fail on scale 35 > precision handling
    val md = new MetadataBuilder().putLong("scale", 35L)
    assert(resolved.getCatalystType(Types.NUMERIC, "NUMBER", 38, md)
      === Some(DecimalType(38, 29)))
  }

  test("clampScale never negative") {
    assert(GraftOracleDialect.clampScale(1, 31) === 0)
    assert(GraftOracleDialect.clampScale(38, 2) === 2)
  }
}
