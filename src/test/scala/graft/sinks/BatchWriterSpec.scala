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
