package graft.types

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the expression-form type mapper to the driver-side [[TypeTranspiler]]:
  * both must emit the same target DDL type for every mapping branch.
  */
class TypeTranspilerExprSpec extends SparkSpec {

  private def meta(
      dt: String,
      p: Option[Int] = None,
      s: Option[Int] = None,
      len: Int = 0,
      avg: Option[Int] = None
  ) = ColumnMeta("c", dt, len, p, s, nullable = true, None, None, avg, 1)

  private val matrix = Seq(
    meta("NUMBER", Some(10), Some(2)),
    meta("NUMBER", Some(40), Some(35)), // scale clamp branch
    meta("NUMBER", Some(38), Some(0), avg = Some(8)),
    meta("NUMBER", avg = Some(6)),
    meta("NUMBER", avg = Some(5)),
    meta("NUMBER"),
    meta("FLOAT"), meta("BINARY_FLOAT"), meta("BINARY_DOUBLE"),
    meta("VARCHAR2", len = 50), meta("NVARCHAR2", len = 20), meta("UROWID", len = 18),
    meta("CHAR", len = 3), meta("NCHAR", len = 2), meta("CHAR"),
    meta("DATE"),
    meta("TIMESTAMP(6)"), meta("TIMESTAMP(6) WITH TIME ZONE"),
    meta("CLOB"), meta("NCLOB"), meta("LONG"),
    meta("BLOB"), meta("RAW"), meta("LONG RAW"),
    meta("XMLTYPE") // passthrough
  )

  test("defaultSqlExpr agrees with rewriteDefault across every rule") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import spark.implicits._
    val raws = Seq(
      "(0)", "  'abc'  ", "SYS_GUID()", "USER", "sysdate", "SYSDATE ",
      "CURRENT_TIMESTAMP(6)", "LOCALTIMESTAMP", "NULL", "", "42", "(3.14)",
      "-7", "42 days", "hello world", "O'Brien", "'quoted'")
    for (numeric <- Seq(true, false)) {
      val target = if (numeric) IntegerType else StringType
      val df = raws.zipWithIndex.map { case (r, i) => (i, r) }.toDF("i", "raw")
      val got = df.select(col("i"),
        TypeTranspiler.defaultSqlExpr(col("raw"), lit(numeric)).as("d"))
        .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
      raws.zipWithIndex.foreach { case (r, i) =>
        assert(got(i) === TypeTranspiler.rewriteDefault(r, target),
          s"raw='$r' numeric=$numeric")
      }
    }
  }

  test("ddlTypeExpr agrees with transpile across every branch") {
    import spark.implicits._
    val df = matrix.zipWithIndex.map { case (m, i) =>
      (i, m.dataType, m.charLength, m.precision, m.scale, m.avgColLen)
    }.toDF("i", "data_type", "char_length", "data_precision", "data_scale", "avg_col_len")
    val got = df.select(col("i"), TypeTranspiler.ddlTypeExpr(
      col("data_type"), col("char_length"), col("data_precision"),
      col("data_scale"), col("avg_col_len")).as("ddl"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    matrix.zipWithIndex.foreach { case (m, i) =>
      val expected = TypeTranspiler.transpile(m).targetDdlType
      assert(got(i) === expected, s"branch ${m.dataType} p=${m.precision} s=${m.scale}")
    }
  }
}
