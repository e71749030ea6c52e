package graft.ddl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DdlGeneratorSpec extends AnyFunSuite {

  test("catalyst → mysql type mapping covers every scalar branch") {
    val expected = Seq(
      ByteType -> "tinyint", ShortType -> "smallint", IntegerType -> "int",
      LongType -> "bigint", FloatType -> "float", DoubleType -> "double",
      DecimalType(12, 2) -> "decimal(12,2)", BooleanType -> "tinyint(1)",
      DateType -> "date", TimestampType -> "datetime(6)",
      TimestampNTZType -> "datetime(6)", BinaryType -> "longblob",
      StringType -> "longtext",
      ArrayType(IntegerType) -> "json",
      MapType(StringType, StringType) -> "json",
      StructType(Seq(StructField("x", IntegerType))) -> "json"
    )
    expected.foreach { case (dt, ddl) =>
      assert(DdlGenerator.toMysqlType(dt) === ddl, dt.toString)
    }
  }

  test("createTable lowercases identifiers, quotes with backticks, carries nullability") {
    val schema = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("Name", StringType, nullable = true)
    ))
    val ddl = DdlGenerator.createTable("Orders", schema)
    assert(ddl ===
      "create table `orders` (\n  `id` bigint not null,\n  `name` longtext\n)")
    assert(DdlGenerator.dropTable("Orders") === "drop table if exists `orders`")
  }

  test("DdlScript normalizes one trailing semicolon per statement") {
    val s = new DdlScript
    s.add("create table t (a int);")
    s.add("drop table t")
    val path = java.nio.file.Files.createTempFile("ddl", ".sql")
    s.writeTo(path.toString)
    val body = java.nio.file.Files.readString(path)
    assert(body === "create table t (a int);\ndrop table t;\n")
    assert(s.all.size === 2)
  }
}
