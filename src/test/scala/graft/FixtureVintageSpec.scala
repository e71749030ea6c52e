package graft

import org.apache.spark.sql.functions._

/** Fixture-vintage drift gate.
  *
  * The driver has regenerated the fixture tables between rounds with
  * different parquet timestamp encodings for `events.ts`: TIMESTAMP
  * (NANOS) — surfaced by Spark 4 as a LONG of nanoseconds under the
  * `nanosAsLong` session flag — and plain TIMESTAMP(MICROS), read as a
  * TIMESTAMP_NTZ column. Round 11 lost four bench queries to exactly
  * this drift (they assumed the long-ns shape and did raw `ts div 1000`
  * arithmetic). [[Fixtures.normalizeTs]] now funnels every reader to
  * one canonical shape; this spec pins that: every event-reading query
  * must return IDENTICAL rows over all three vintage encodings of the
  * same data, so the next silent fixture regeneration breaks loudly
  * here instead of in the round artifact.
  */
class FixtureVintageSpec extends SparkSpec {

  private val eventQueries = Seq(
    "q_events_hourly", "q_events_sessionize",
    "q_events_props_flatten", "q_events_props_flatten_nested",
    "q_f7_regex_extract", "q_f6_json",
    "q_j7_asof_join", "q_j8_range_join")

  /** Write a variant fixture dir whose events table carries `ts`
    * re-encoded by `reshape`; only events.parquet is materialized —
    * the event queries read nothing else.
    */
  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def variantDir(tag: String)(
      reshape: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_vintage_$tag")
    tempDirs += dir.toString
    val canonical = spark.read.parquet(s"$sfDir/events.parquet")
    reshape(Fixtures.normalizeTs(canonical))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  override def afterAll(): Unit = {
    tempDirs.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    super.afterAll()
  }

  // post-normalizeTs canonical shape, round-tripped through parquet —
  // the baseline the re-encoded vintages must reproduce
  private lazy val microsDir = variantDir("us")(identity)
  // TIMESTAMP(NANOS) vintage as the nanosAsLong session flag surfaces
  // it: a raw long of epoch nanoseconds
  private lazy val nanosLongDir = variantDir("ns")(
    _.withColumn("ts", unix_micros(col("ts")) * lit(1000L)))
  // plain-MICROS vintage as Spark reads it: TIMESTAMP_NTZ (session
  // zone is UTC, so the wall-clock fields encode the same instant)
  private lazy val ntzDir = variantDir("ntz")(
    _.withColumn("ts", col("ts").cast("timestamp_ntz")))

  private def rowsOf(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().toSeq.map(_.toString)

  for (q <- eventQueries) test(s"$q is vintage-invariant") {
    val base = rowsOf(q, microsDir)
    assert(base.nonEmpty, s"$q returned no rows on the canonical vintage")
    assert(rowsOf(q, nanosLongDir) == base, s"$q drifts on the nanos-long vintage")
    assert(rowsOf(q, ntzDir) == base, s"$q drifts on the TIMESTAMP_NTZ vintage")
  }

  test("normalizeTs yields a plain timestamp on every vintage") {
    for (d <- Seq(microsDir, nanosLongDir, ntzDir)) {
      val dt = Fixtures.normalizeTs(spark.read.parquet(s"$d/events.parquet"))
        .schema("ts").dataType
      assert(dt == org.apache.spark.sql.types.TimestampType,
        s"$d normalizes to $dt")
    }
  }
}
