package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class BatchWriterSpec extends AnyFunSuite {

  test("batch clamp: 65535/ncols - 10 ceiling (reference cmd/root.go:376)") {
    // wide table: clamp kicks in
    assert(BatchWriter.effectiveBatchSize(100000, 100) === 65535 / 100 - 10)
    // narrow table: configured value survives
    assert(BatchWriter.effectiveBatchSize(1000, 5) === 1000)
    // degenerate: never below 1
    assert(BatchWriter.effectiveBatchSize(1000, 65535) === 1)
  }

  test("batch clamp requires columns") {
    intercept[IllegalArgumentException](BatchWriter.effectiveBatchSize(10, 0))
  }

  test("range delete SQL quotes identifiers and uses half-open bounds") {
    assert(BatchWriter.deleteRangeSql("t1", "id", 100, 200) ===
      "DELETE FROM `t1` WHERE `id` >= 100 AND `id` < 200")
  }

  test("connection budget: embedded engines clamp to one writer, servers keep theirs") {
    // in-process: concurrent writers only contend (sf1 soak: 1 writer
    // 72s, 2-16 writers 135-194s on the same 6M-row Derby sync)
    assert(BatchWriter.connectionBudget("jdbc:derby:/tmp/db;create=true", 16) === 1)
    assert(BatchWriter.connectionBudget("jdbc:derby:memory:x;create=true", 16) === 1)
    assert(BatchWriter.connectionBudget("jdbc:h2:~/test", 16) === 1)
    assert(BatchWriter.connectionBudget("jdbc:h2:mem:x", 16) === 1)
    assert(BatchWriter.connectionBudget("jdbc:sqlite:/tmp/x.db", 16) === 1)
    assert(BatchWriter.connectionBudget("jdbc:hsqldb:file:/tmp/x", 16) === 1)
    // client/server: the configured parallel budget stands
    assert(BatchWriter.connectionBudget("jdbc:derby://host:1527/db", 16) === 16)
    assert(BatchWriter.connectionBudget("jdbc:h2:tcp://host/db", 16) === 16)
    assert(BatchWriter.connectionBudget("jdbc:hsqldb:hsql://host/db", 16) === 16)
    assert(BatchWriter.connectionBudget("jdbc:mysql://host/db", 16) === 16)
    assert(BatchWriter.connectionBudget("jdbc:oracle:thin:@host:1521/db", 16) === 16)
  }
}

class IdempotentRangeSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("replaying a parquet range write converges to exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    val li = table("lineitem")
    // write two ranges, then REPLAY the first (simulated retry)
    BatchWriter.writeParquetRange(li, dir, "lineitem", "l_orderkey", 0, 1000)
    BatchWriter.writeParquetRange(li, dir, "lineitem", "l_orderkey", 1000, 10000000)
    BatchWriter.writeParquetRange(li, dir, "lineitem", "l_orderkey", 0, 1000)

    val copied = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(copied.count() === li.count(), "replay must not duplicate rows")
    assert(copied.select(sum(col("l_quantity").cast("decimal(18,4)"))).collect()(0).getDecimal(0) ===
      li.select(sum(col("l_quantity").cast("decimal(18,4)"))).collect()(0).getDecimal(0))
  }
}
