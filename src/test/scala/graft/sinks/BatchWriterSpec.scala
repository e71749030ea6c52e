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
}
