package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private def asof(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    val left = l.toDF("id", "k", "ts")
    val right = r.toDF("k", "rts", "v")
    Temporal.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(row => (row.getLong(0),
        if (row.isNullAt(3)) None else Some((row.getLong(3), row.getDouble(4)))))
  }

  test("asof join picks the latest right row at or before each left ts") {
    val out = asof(
      l = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 999L)),
      r = Seq((7L, 50L, 1.0), (7L, 100L, 2.0), (7L, 300L, 3.0)))
    // ties match (ASOF >=): left@100 takes right@100, not right@50
    assert(out.toSeq === Seq(
      (1L, Some((100L, 2.0))),
      (2L, Some((100L, 2.0))),
      (3L, Some((300L, 3.0)))))
  }

  test("asof join is left-outer: no earlier right row -> nulls; keys don't leak") {
    val out = asof(
      l = Seq((1L, 7L, 10L), (2L, 8L, 500L), (3L, 9L, 500L)),
      r = Seq((7L, 50L, 1.0), (8L, 499L, 2.0)))
    assert(out.toSeq === Seq(
      (1L, None),            // right row exists but is LATER
      (2L, Some((499L, 2.0))),
      (3L, None)))           // key 9 has no right rows at all
  }

  private def asofFwd(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    val left = l.toDF("id", "k", "ts")
    val right = r.toDF("k", "rts", "v")
    Temporal.asofJoinForward(left, right, "k", "ts", "rts", Seq("v"))
      .orderBy("id")
      .collect()
      .map(row => (row.getLong(0),
        if (row.isNullAt(3)) None else Some((row.getLong(3), row.getDouble(4)))))
  }

  test("forward asof picks the earliest right row at or after each left ts") {
    val out = asofFwd(
      l = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 999L)),
      r = Seq((7L, 50L, 1.0), (7L, 100L, 2.0), (7L, 300L, 3.0)))
    // ties match (ASOF <=): left@100 takes right@100, not right@300;
    // nothing at-or-after 999 -> null
    assert(out.toSeq === Seq(
      (1L, Some((100L, 2.0))),
      (2L, Some((300L, 3.0))),
      (3L, None)))
  }

  test("asof: null timestamps never match, identically in both directions") {
    import spark.implicits._
    // a null-ts right row used to sort nulls-FIRST in the backward
    // window and get carried as a spurious match, while the forward
    // direction (nulls-last) did not — the mirrored operators disagreed
    val left = Seq((1L, 1L, Some(5L)), (2L, 1L, Option.empty[Long]))
      .toDF("id", "k", "ts")
    val right = Seq((1L, Option.empty[Long], 9.0), (1L, Some(100L), 7.0))
      .toDF("k", "rts", "v")
    def run(fwd: Boolean) = {
      val out = if (fwd) Temporal.asofJoinForward(left, right, "k", "ts", "rts", Seq("v"))
                else Temporal.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      out.orderBy("id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
        .toSeq
    }
    // backward: nothing at-or-before 5; forward: right@100 is ahead of 5
    assert(run(fwd = false) == Seq((1L, None), (2L, None)))
    assert(run(fwd = true) == Seq((1L, Some((100L, 7.0))), (2L, None)))
  }

  test("forward asof matches a quadratic reference on the events fixture") {
    import spark.implicits._
    val ev = table("events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us")).limit(150)
    val r = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("r_ts"))
      .agg(max(col("value")).as("v"))
    val fast = Temporal.asofJoinForward(l, r, "user_id", "ts_us", "r_ts", Seq("v"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some((row.getLong(3), row.getDouble(4)))))
      .toMap
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val slow = l.collect().map { x =>
      val (id, u, ts) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rRows.filter(t => t._1 == u && t._2 >= ts)
      id -> (if (cands.isEmpty) None
             else { val m = cands.minBy(_._2); Some((m._2, m._3)) })
    }.toMap
    assert(fast === slow)
    assert(fast.nonEmpty && fast.values.exists(_.isDefined))
  }

  test("asof join runs as ONE hash shuffle per side input (no range-join blowup)") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i, i % 5, i * 10)).toDF("id", "k", "ts")
    val right = (1L to 1000L).map(i => (i % 5, i, i / 100.0)).toDF("k", "rts", "v")
    val df = Temporal.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    // union + keyed window: exactly one hashpartitioning exchange, and
    // no join operator at all — the carry-forward IS the join
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"), plan)
    assert(df.count() === 100L)
  }

  test("range join: inclusive bounds, bin-spanning intervals match once") {
    import spark.implicits._
    val pts = Seq((1L, 7L, 100L), (2L, 7L, 150L), (3L, 7L, 201L), (4L, 8L, 150L))
      .toDF("id", "k", "ts")
    // interval [100, 200] spans bins 1..4 at width 50 — the pair (2, i1)
    // must appear exactly once despite the replication
    val iv = Seq((10L, 7L, 100L, 200L), (11L, 8L, 140L, 160L))
      .toDF("iid", "k", "lo", "hi")
    val out = Temporal.rangeJoin(pts, iv, "k", "ts", "lo", "hi", binWidth = 50L)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq === Seq((1L, 10L), (2L, 10L), (4L, 11L)))
  }

  test("range join plans an equi hash join, not a nested loop") {
    import spark.implicits._
    val pts = (1L to 200L).map(i => (i, i % 3, i * 7)).toDF("id", "k", "ts")
    val iv = (1L to 50L).map(i => (i, i % 3, i * 20, i * 20 + 100)).toDF("iid", "k", "lo", "hi")
    val df = Temporal.rangeJoin(pts, iv, "k", "ts", "lo", "hi", binWidth = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // agreement with the naive inequality join
    val naive = pts.as("p").join(iv.as("i"),
      col("p.k") === col("i.k") && col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val binned = df.select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.toSeq === naive.toSeq)
  }

  test("asof matches the quadratic reference implementation on the events fixture") {
    val ev = table("events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_ns"),
        col("value").as("l_value"))
    val r = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("r_ts"))
      .agg(max(col("value")).as("r_value"))
    val fast = Temporal.asofJoin(l, r, "user_id", "ts_ns", "r_ts", Seq("r_value"))
    // reference: explicit range join + argmax — the plan asofJoin avoids
    val byMax = l.join(r, l("user_id") === r("user_id") && l("ts_ns") >= r("r_ts"), "inner")
      .groupBy(col("event_id").as("e2"))
      .agg(max(col("r_ts")).as("m_ts"))
    val slow = fast.select("event_id", "asof_r_ts")
    val joined = slow.join(byMax, col("event_id") === col("e2"), "left_outer")
    val disagree = joined.filter(
      (col("m_ts").isNotNull && (col("asof_r_ts").isNull || col("asof_r_ts") =!= col("m_ts"))) ||
        (col("m_ts").isNull && col("asof_r_ts").isNotNull)).count()
    assert(disagree === 0L)
  }

  test("gapFill: aligned grid per key, forward-filled values, honest leading null") {
    import spark.implicits._
    // key 7: obs at t=25 and t=42, step 10 -> aligned buckets 20,30,40
    // key 8: one obs exactly on a boundary -> single bucket, no null
    val obs = Seq((7L, 25L, 1.0), (7L, 42L, 2.0), (8L, 30L, 9.0))
      .toDF("k", "us", "v")
    val out = Temporal.gapFill(obs, "k", "us", Seq("v"), stepUs = 10L)
      .orderBy("k", "bucket_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
    assert(out.toSeq === Seq(
      (7L, 20L, None), // bucket instant 20 precedes the first obs at 25
      (7L, 30L, Some((25L, 1.0))),
      (7L, 40L, Some((25L, 1.0))), // 42 is after the instant; 25 carries
      (8L, 30L, Some((30L, 9.0))))) // boundary obs matches its own bucket
  }

  test("gapFill: a span/step blowup fails loudly instead of exploding the grid") {
    import spark.implicits._
    val obs = Seq((1L, 0L, 1.0), (1L, 10_000_000L, 2.0)).toDF("k", "us", "v")
    val ex = intercept[Exception] {
      Temporal.gapFill(obs, "k", "us", Seq("v"), stepUs = 1L,
        maxBucketsPerKey = 1000L).count()
    }
    assert(ex.getMessage != null)
  }

  test("gapFill plans one explode + one asof shuffle — no join blowup") {
    import spark.implicits._
    val obs = Seq((1L, 5L, 1.0), (1L, 25L, 2.0)).toDF("k", "us", "v")
    val plan = Temporal.gapFill(obs, "k", "us", Seq("v"), stepUs = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Generate"), plan) // sequence+explode grid
  }
}
