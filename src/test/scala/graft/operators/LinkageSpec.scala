package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truth: every cross pair under the verify predicate. */
  private def brute(
      l: Seq[(Long, String)], r: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (la, ka) <- l
      (lb, kb) <- r
      d = graft.operators.LinkageSpec.lev(ka, kb) if d <= k
    } yield (la, lb, d.toLong)).toSet

  test("editDistanceJoin is exact on an adversarial fixture: shorts, empties, repeats, boilerplate prefixes") {
    val leftRows = Seq(
      1L -> "Supplier#000000001", 2L -> "Supplier#000000010", 3L -> "aaaa",
      4L -> "ab", 5L -> "", 6L -> "x", 7L -> "the same boilerplate header A",
      8L -> "zzzz")
    val rightRows = Seq(
      11L -> "Supplier#000000002", 12L -> "Supplier#000000010", 13L -> "aaba",
      14L -> "ba", 15L -> "a", 16L -> "xy", 17L -> "the same boilerplate header B",
      18L -> "qqqq")
    for (k <- 0 to 3) {
      val got = Linkage.editDistanceJoin(
        leftRows.toDF("id", "key"), "id", "key",
        rightRows.toDF("id", "key"), "id", "key", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(leftRows, rightRows, k), s"k=$k")
    }
  }

  test("editDistanceJoin: null keys never match; duplicate keys fan out per row id") {
    val l = Seq((1L, Some("abc")), (2L, None), (3L, Some("abc"))).toDF("id", "key")
    val r = Seq((11L, Some("abd")), (12L, None)).toDF("id", "key")
    val got = Linkage.editDistanceJoin(l, "id", "key", r, "id", "key", maxDist = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // both 'abc' rows pair with 'abd'; the null rows pair with nothing
    assert(got === Set((1L, 11L, 1L), (3L, 11L, 1L)))
  }

  test("editDistancePairs: unordered self pairs once, exact dups report dist 0, maxDist 0 is exact-dup detection") {
    val rows = Seq(1L -> "alpha", 2L -> "alpha", 3L -> "alphb", 4L -> "omega")
    val got = Linkage.editDistancePairs(rows.toDF("id", "key"), "id", "key", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val exactOnly = Linkage.editDistancePairs(rows.toDF("id", "key"), "id", "key", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exactOnly === Set((1L, 2L, 0L)))
  }

  test("blocking really blocks: no cartesian product in the plan, candidates stay under the cross count") {
    // 200 boilerplate-prefixed entities: only pairs differing in the
    // last digit are within distance 1 (any other digit change also
    // flips no parity), so the true pair count is far below the cross
    val ents = (0 until 200).map(i => (i.toLong, f"Entity#$i%09d"))
    val df = ents.toDF("id", "key")
    val joined = Linkage.editDistanceJoin(
      df.filter(col("id") % 2 === 0), "id", "key",
      df.filter(col("id") % 2 === 1), "id", "key", maxDist = 1)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // rarest-first prefixes on boilerplate-prefixed names: the hot
    // "En","nt",… grams never block, only the distinguishing digits do
    val n = joined.count()
    assert(n === 500L, s"even-odd dist-1 pairs: got $n") // 25 per decade × 20
    assert(n < 100L * 100L / 10L, s"$n pairs vs cross ${100 * 100}")
  }

  test("the levenshtein verify sits ABOVE the pinned candidate cache, never in a join condition") {
    // The candidate pin's whole value (a 9x win) is that the verify
    // runs once per DISTINCT candidate pair: the cache is an optimizer
    // BARRIER that keeps `levenshtein <= k` from being pushed below
    // the distinct into the gram join's condition, where it re-ran per
    // RAW gram collision concentrated in the hottest gram buckets.
    // That barrier is behavioral, not contractual — if a Spark upgrade
    // starts pushing predicates through InMemoryRelation, or the pin
    // is removed, the win silently evaporates. This gate turns that
    // into a loud failure.
    val ents = (0 until 80).map(i => (i.toLong, f"Entity#$i%09d"))
    val df = ents.toDF("id", "key")
    val joined = Linkage.editDistanceJoin(
      df.filter(col("id") % 2 === 0), "id", "key",
      df.filter(col("id") % 2 === 1), "id", "key", maxDist = 1)
    joined.count() // finalize the adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"candidate set must stay pinned:\n$plan")
    val joinLinesWithVerify = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("levenshtein")).toSeq
    assert(joinLinesWithVerify.isEmpty,
      s"levenshtein leaked into a join condition — the pin barrier is " +
        s"gone:\n$plan")
    // the verify may sit in a Filter/Project above the cache scan, or
    // in the InMemoryTableScan's own stored-filter list (evaluated
    // over the cached — already deduped — batches: still once per
    // distinct pair); what it must never do is ride a Join condition
    val verifyLines = plan.linesIterator.filter(_.contains("levenshtein")).toSeq
    assert(verifyLines.nonEmpty && verifyLines.forall(l =>
      l.contains("Filter") || l.contains("Project") ||
        l.contains("InMemoryTableScan")),
      s"levenshtein must run as a filter/projection over the cached " +
        s"candidates:\n$plan")
  }
}

object LinkageSpec {
  /** Reference Levenshtein for the brute-force truth set. */
  private[operators] def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
