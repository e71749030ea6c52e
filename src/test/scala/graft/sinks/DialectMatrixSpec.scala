package graft.sinks

import java.util.Properties

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ddl.DdlGenerator

/** Golden-string dialect matrix: the sandbox ships no MySQL-kernel
  * engine (Derby proves the ANSI branch live — DerbyLiveJdbcSpec), so
  * the MySQL-kernel branch — backtick quoting, the reference's DDL
  * type mapping, the 65535-placeholder clamp (cmd/root.go:376), the
  * TRUNCATE text — is pinned here as EXACT generated text for a fixed
  * table meta. A quoting or clamp regression changes bytes on the wire
  * of every real MySQL migration; these goldens catch it without an
  * engine.
  */
class DialectMatrixSpec extends SparkSpec {

  // ------------------------------------------------------------ quoting

  test("identifier quoting goldens: ANSI doubles quotes, MySQL doubles backticks") {
    assert(SqlQuote.ansi("orders") === "\"orders\"")
    assert(SqlQuote.ansi("we\"ird") === "\"we\"\"ird\"")
    assert(SqlQuote.backtick("orders") === "`orders`")
    assert(SqlQuote.backtick("we`ird") === "`we``ird`")
    // a hostile name can't break out of either quoting form
    assert(SqlQuote.ansi("a\"; DROP TABLE x --") === "\"a\"\"; DROP TABLE x --\"")
    assert(SqlQuote.backtick("a`; DROP TABLE x --") === "`a``; DROP TABLE x --`")
  }

  test("URL sniffing picks the dialect branch: mysql/mariadb backtick, everything else ANSI") {
    assert(SqlQuote.forUrl("jdbc:mysql://h:3306/db")("t") === "`t`")
    assert(SqlQuote.forUrl("jdbc:mariadb://h/db")("t") === "`t`")
    assert(SqlQuote.forUrl("jdbc:derby:memory:x;create=true")("t") === "\"t\"")
    assert(SqlQuote.forUrl("jdbc:postgresql://h/db")("t") === "\"t\"")
    assert(SqlQuote.forUrl("jdbc:oracle:thin:@h:1521:x")("t") === "\"t\"")
    // JdbcDest inherits the sniff; an explicit override wins
    val mysqlDest = JdbcDest("jdbc:mysql://h/db", new Properties())
    assert(mysqlDest.quoteIdent("orders") === "`orders`")
    val overridden = JdbcDest("jdbc:mysql://h/db", new Properties(),
      quoteIdentOverride = Some(SqlQuote.ansi))
    assert(overridden.quoteIdent("orders") === "\"orders\"")
  }

  test("Spark's own MySQL dialect backtick-quotes INSERT/TRUNCATE identifiers") {
    // the write path hands Spark a pre-quoted TABLE name but Spark
    // quotes the COLUMN list itself via the URL's dialect — pin that a
    // real MySQL URL resolves to backtick quoting, so the statement
    // FakeJdbcSpec captures shape-wise is backtick-quoted on MySQL
    val d = JdbcDialects.get("jdbc:mysql://host:3306/db")
    assert(d.quoteIdentifier("l_orderkey") === "`l_orderkey`")
    assert(d.getTruncateQuery("`orders`") === "TRUNCATE TABLE `orders`")
    // and the ANSI engines double-quote — the branch Derby proves live
    assert(JdbcDialects.get("jdbc:derby:memory:x")
      .quoteIdentifier("l_orderkey") === "\"l_orderkey\"")
  }

  // ---------------------------------------------------------------- DDL

  private val meta = StructType(Seq(
    StructField("ID", LongType, nullable = false),
    StructField("Name", StringType),
    StructField("amount", DecimalType(12, 2)),
    StructField("ratio", DoubleType),
    StructField("payload", BinaryType),
    StructField("born", DateType),
    StructField("seen", TimestampType),
    StructField("ok", BooleanType),
    StructField("vec", ArrayType(FloatType))))

  test("MySQL-kernel CREATE TABLE golden: exact text for a fixed table meta") {
    val expected =
      """create table `orders` (
        |  `id` bigint not null,
        |  `name` longtext,
        |  `amount` decimal(12,2),
        |  `ratio` double,
        |  `payload` longblob,
        |  `born` date,
        |  `seen` datetime(6),
        |  `ok` tinyint(1),
        |  `vec` json
        |)""".stripMargin
    assert(DdlGenerator.createTable("Orders", meta) === expected)
    assert(DdlGenerator.dropTable("Orders") === "drop table if exists `orders`")
  }

  test("range-delete golden per dialect (the idempotent-replay statement)") {
    assert(BatchWriter.deleteRangeSql("orders", "o_orderkey", 100L, 200L) ===
      "DELETE FROM `orders` WHERE `o_orderkey` >= 100 AND `o_orderkey` < 200")
    assert(BatchWriter.deleteRangeSql("orders", "o_orderkey", 100L, 200L,
      quoteIdent = SqlQuote.ansi) ===
      "DELETE FROM \"orders\" WHERE \"o_orderkey\" >= 100 AND \"o_orderkey\" < 200")
  }

  // -------------------------------------------------------------- clamp

  test("65535-placeholder clamp matrix (reference cmd/root.go:376 parity)") {
    import BatchWriter.effectiveBatchSize
    // wide-open config clamps to 65535/ncols - 10
    assert(effectiveBatchSize(50000, 7) === 65535 / 7 - 10)   // 9352
    assert(effectiveBatchSize(50000, 7) === 9352)
    // a modest config passes through unclamped
    assert(effectiveBatchSize(1000, 7) === 1000)
    // the 16-col lineitem-ish shape
    assert(effectiveBatchSize(10000, 16) === 65535 / 16 - 10) // 4085
    // degenerate widths floor at one row per batch, never 0 or negative
    assert(effectiveBatchSize(1000, 65535) === 1)
    assert(effectiveBatchSize(1000, 10000) === 1)
    // single column: clamp is 65525
    assert(effectiveBatchSize(100000, 1) === 65525)
    intercept[IllegalArgumentException](effectiveBatchSize(1000, 0))
  }
}
