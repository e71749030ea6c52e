package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The reference's pagination had a published boundary bug
  * (readme.md:318), so the planner's cover/disjoint properties are
  * property-tested (seeded random cases), not example-tested.
  */
class PartitionPlannerSpec extends AnyFunSuite {

  test("pageCount matches ceil semantics") {
    assert(PartitionPlanner.pageCount(0, 100) === 0)
    assert(PartitionPlanner.pageCount(1, 100) === 1)
    assert(PartitionPlanner.pageCount(100, 100) === 1)
    assert(PartitionPlanner.pageCount(101, 100) === 2)
    assert(PartitionPlanner.pageCount(1000000, 100000) === 10)
  }

  test("splitRange: disjoint, sorted, exact cover (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lo = rnd.between(-100000L, 100000L)
      val hi = lo + rnd.between(0L, 500000L)
      val n = rnd.between(1, 65)
      val ranges = PartitionPlanner.splitRange(lo, hi, n)
      // first starts at lo, last ends exactly at hi (closed)
      assert(ranges.head._1 === lo)
      assert(ranges.last._2 === hi)
      // contiguous + disjoint: each half-open range starts where the
      // previous one ended
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 === l2)
        case _                     => ()
      }
      // total width (half-open semantics; last is closed) covers the span
      val widths = ranges.init.map { case (l, h) => h - l }.sum
      assert(widths + (hi - ranges.last._1 + 1) === (hi - lo + 1))
      // never more partitions than key values
      assert(ranges.length <= math.min(n.toLong, hi - lo + 1))
    }
  }

  test("plan: empty table -> EmptyScan with zero predicates") {
    assert(PartitionPlanner.plan(0, 1000, Some(("k", 1, 10))) === EmptyScan)
    assert(EmptyScan.predicates.isEmpty)
  }

  test("plan: no split key -> FullScan single partition") {
    assert(PartitionPlanner.plan(5000, 1000, None) === FullScan)
    assert(FullScan.predicates.length === 1)
  }

  test("plan: small table (one page) -> FullScan even with a key") {
    assert(PartitionPlanner.plan(500, 1000, Some(("k", 1, 500))) === FullScan)
  }

  test("plan: maxParallel caps partition count") {
    val p = PartitionPlanner.plan(1000000, 1000, Some(("k", 1, 1000000)), maxParallel = 8)
    p match {
      case RangeScan(_, bounds) => assert(bounds.length === 8)
      case other                => fail(s"expected RangeScan, got $other")
    }
  }

  test("RangeScan predicates: last page closed, others half-open") {
    val preds = RangeScan("k", Seq((1L, 5L), (5L, 10L))).predicates
    assert(preds(0) === "k >= 1 AND k < 5")
    assert(preds(1) === "k >= 5 AND k <= 10")
  }
}
