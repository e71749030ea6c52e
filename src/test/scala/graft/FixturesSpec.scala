package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** [[Fixtures.normalizeTs]] must hand every downstream operator ONE
  * `ts` shape — session-zone TimestampType at microsecond grain — no
  * matter which vintage of the events fixture the driver shipped.
  */
class FixturesSpec extends SparkSpec {

  import spark.implicits._

  private val us = 1706000000000000L // fixed instant, μs

  test("long-ns vintage converts to a microsecond timestamp, exactly") {
    val df = Seq((1L, us * 1000 + 999)).toDF("event_id", "ts") // ns + sub-μs dust
    val out = Fixtures.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // integer ns→μs division truncates the dust, no double round-trip
    assert(out.select(unix_micros(col("ts"))).collect()(0).getLong(0) === us)
  }

  test("TIMESTAMP_NTZ vintage casts to session-zone timestamp, same instant (UTC session)") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(us)).cast("timestamp_ntz"))
    val out = Fixtures.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect()(0).getLong(0) === us)
  }

  test("already-normalized and ts-less frames pass through unchanged") {
    val ok = Seq(1L).toDF("event_id").withColumn("ts", timestamp_micros(lit(us)))
    assert(Fixtures.normalizeTs(ok).schema("ts").dataType === TimestampType)
    val none = Seq((1L, "x")).toDF("doc_id", "text")
    assert(Fixtures.normalizeTs(none) eq none) // no-op, not a rewrite
  }

  test("the shipped events fixture normalizes to timestamp whatever its vintage") {
    val ev = table("events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(count(lit(1))).collect()(0).getLong(0) > 0)
    // column order preserved: withColumn replaces in place
    assert(ev.columns.indexOf("ts") ===
      spark.read.parquet(s"$sfDir/events.parquet").columns.indexOf("ts"))
  }

  test("normalized ts is usable by event-time ops: window + unix_micros round-trip") {
    val ev = table("events").limit(100)
    val n = ev.count()
    assert(ev.select(timestamp_micros(unix_micros(col("ts"))).as("rt"), col("ts"))
      .filter(col("rt") =!= col("ts")).count() === 0)
    assert(ev.groupBy(date_trunc("hour", col("ts"))).count()
      .agg(sum("count")).collect()(0).getLong(0) === n)
  }
}
