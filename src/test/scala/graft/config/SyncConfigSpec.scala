package graft.config

import org.scalatest.funsuite.AnyFunSuite

class SyncConfigSpec extends AnyFunSuite {

  val yml =
    """src:
      |  host: 10.0.0.1
      |  port: 1521
      |  database: orcl
      |  username: admin
      |  password: secret
      |dest:
      |  host: 10.0.0.2
      |  port: 3306
      |  database: test
      |  username: root
      |  password: pw
      |pageSize: 50000
      |maxParallel: 16
      |batchRowSize: 500
      |tables:
      |  t1:
      |    - select * from t1 where id > 0
      |exclude:
      |  operationlog
      |""".stripMargin

  test("parses reference-shaped YAML") {
    val c = SyncConfig.parse(yml)
    assert(c.src.host === "10.0.0.1")
    assert(c.src.port === 1521)
    assert(c.dest.database === "test")
    assert(c.pageSize === 50000L)
    assert(c.maxParallel === 16)
    assert(c.batchRowSize === 500)
    assert(c.tables === Map("t1" -> Seq("select * from t1 where id > 0")))
    assert(c.exclude === Set("operationlog"))
  }

  test("defaults match the reference's example.yml") {
    val c = SyncConfig()
    assert(c.pageSize === 100000L)
    assert(c.maxParallel === 100)
    assert(c.batchRowSize === 1000)
  }

  test("jdbc url assembly") {
    val e = Endpoint("h", 1521, "db", "u", "p")
    assert(e.oracleJdbcUrl === "jdbc:oracle:thin:@//h:1521/db")
    assert(Endpoint("h", 3306, "db", "u", "p").mysqlJdbcUrl
      .startsWith("jdbc:mysql://h:3306/db"))
  }
}
