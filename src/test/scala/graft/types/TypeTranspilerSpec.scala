package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeTranspilerSpec extends AnyFunSuite {

  private def meta(
      dt: String,
      p: Option[Int] = None,
      s: Option[Int] = None,
      len: Int = 0,
      avg: Option[Int] = None,
      default: Option[String] = None
  ) = ColumnMeta("c", dt, len, p, s, nullable = true, default, None, avg, 1)

  // Table-driven spec of the reference mapping (cmd/tablemeta.go:133-158)
  private val cases = Seq(
    (meta("NUMBER", Some(10), Some(2)), DecimalType(10, 2), "decimal(10,2)"),
    (meta("NUMBER", Some(38), Some(0), avg = Some(8)), LongType, "bigint"),
    (meta("NUMBER", avg = Some(6)), LongType, "bigint"),
    (meta("NUMBER", avg = Some(5)), IntegerType, "int"),
    (meta("NUMBER"), IntegerType, "int"),
    (meta("VARCHAR2", len = 50), StringType, "varchar(50)"),
    (meta("NVARCHAR2", len = 20), StringType, "varchar(20)"),
    (meta("UROWID", len = 18), StringType, "varchar(18)"),
    (meta("CHAR", len = 3), StringType, "char(3)"),
    (meta("NCHAR", len = 1), StringType, "char(1)"),
    (meta("DATE"), TimestampType, "datetime"),
    (meta("TIMESTAMP(6)"), TimestampType, "datetime(6)"),
    (meta("TIMESTAMP(6) WITH TIME ZONE"), TimestampType, "datetime(6)"),
    (meta("CLOB"), StringType, "longtext"),
    (meta("NCLOB"), StringType, "longtext"),
    (meta("LONG"), StringType, "longtext"),
    (meta("BLOB"), BinaryType, "longblob"),
    (meta("RAW"), BinaryType, "longblob"),
    (meta("LONG RAW"), BinaryType, "longblob"),
    (meta("XMLTYPE"), StringType, "xmltype") // passthrough verbatim
  )

  cases.foreach { case (m, catalyst, ddl) =>
    test(s"${m.dataType} p=${m.precision} s=${m.scale} avg=${m.avgColLen} -> $ddl") {
      val t = TypeTranspiler.transpile(m)
      assert(t.catalystType === catalyst)
      assert(t.targetDdlType === ddl)
    }
  }

  test("scale > 30 clamps to least(p,30)-1") {
    assert(TypeTranspiler.clampPrecisionScale(Some(38), Some(35)) === ((38, 29)))
    assert(TypeTranspiler.clampPrecisionScale(Some(20), Some(31)) === ((20, 19)))
    assert(TypeTranspiler.clampPrecisionScale(Some(10), Some(2)) === ((10, 2)))
  }

  test("default rewrite: generators drop, timestamps normalize, numerics extract") {
    def rw(d: String, t: DataType = StringType) = TypeTranspiler.rewriteDefault(d, t)
    assert(rw("SYS_GUID()") === None)
    assert(rw("USER") === None)
    assert(rw("SYSDATE") === Some("CURRENT_TIMESTAMP"))
    assert(rw("CURRENT_TIMESTAMP(6)") === Some("CURRENT_TIMESTAMP"))
    assert(rw("(42.5)", DoubleType) === Some("42.5"))
    assert(rw(" 7 ", IntegerType) === Some("7"))
    assert(rw("'abc'") === Some("'abc'"))
    assert(rw("abc") === Some("'abc'"))
    assert(rw("NULL") === None)
  }

  test("createTableDdl assembles ordered, quoted, commented DDL") {
    val cols = Seq(
      ColumnMeta("ID", "NUMBER", 0, Some(38), Some(0), nullable = false, None,
        Some("pk"), Some(8), 1),
      ColumnMeta("NAME", "VARCHAR2", 30, None, None, nullable = true,
        Some("'x'"), None, None, 2)
    )
    val ddl = TypeTranspiler.createTableDdl("T1", cols)
    assert(ddl.contains("create table `t1`"))
    assert(ddl.contains("`id` bigint not null comment 'pk'"))
    assert(ddl.contains("`name` varchar(30) default 'x'"))
    assert(ddl.indexOf("`id`") < ddl.indexOf("`name`"))
  }
}
