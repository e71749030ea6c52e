package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString
  private val GapUs = 30L * 60 * 1000000 // 30 min

  private def eventsUs = table("events").select(
    col("user_id"),
    unix_micros(col("ts")).as("us"),
    col("event_id"),
    col("value"))

  test("batch sessionization: sessions partition each user's events; gaps respected") {
    val sessions = Sessionize.batch(eventsUs, "user_id", "us", "value", "event_id", GapUs)
    val ev = eventsUs.agg(count(lit(1)), countDistinct(col("user_id"))).collect()(0)
    val (nEvents, nUsers) = (ev.getLong(0), ev.getLong(1))
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).collect()(0).getLong(0) === nEvents)
    assert(sessions.select("user_id").distinct().count() === nUsers)
    // sessions are internally gap-consistent and pairwise gap-separated
    val byUser = sessions.orderBy("user_id", "start_us").collect()
      .groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { ss =>
      ss.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > GapUs,
            s"adjacent sessions closer than gap: $a $b")
        case _ => ()
      }
      ss.foreach(s => assert(s.getAs[Long]("start_us") <= s.getAs[Long]("end_us")))
    }
  }

  test("late events beyond the watermark are dropped, closed sessions stay closed") {
    import spark.implicits._
    val srcDir = tmp("graft_sess_late_src")
    // batch 1: the full fixture (spans hours of event time)
    table("events").write.mode("overwrite").parquet(srcDir)

    def runOnce(ckpt: String, outDir: String): Unit = {
      val streamEvents = IncrementalSync.eventsStream(spark, srcDir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_time"), col("value"))
        .as[SessEvent]
      Sessionize.stream(streamEvents, GapUs, watermark = "30 minutes")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .start()
        .awaitTermination(180000)
    }
    val ckpt = tmp("graft_sess_late_ckpt")
    val outDir = tmp("graft_sess_late_out")
    runOnce(ckpt, outDir)
    val firstRun = spark.read.parquet(s"$outDir/batch=*")
      .collect().map(_.toString).toSet
    assert(firstRun.nonEmpty)

    // batch 2: one VERY late event (event time = fixture minimum, hours
    // behind the watermark) for a user with closed sessions
    val victim = spark.read.parquet(s"$outDir/batch=*")
      .select("user_id").collect()(0).getLong(0)
    table("events").orderBy("ts").limit(1)
      .select(col("event_id"), col("ts"), lit(victim).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("append").parquet(srcDir)
    runOnce(ckpt, outDir)

    val secondRun = spark.read.parquet(s"$outDir/batch=*")
      .collect().map(_.toString).toSet
    // the late event must not re-emit or mutate any session for the
    // victim user: every session from run 1 is still present unchanged
    assert(firstRun.subsetOf(secondRun),
      s"closed sessions changed: ${(firstRun -- secondRun).take(3)}")
  }

  test("streaming sessionization matches the batch analog for watermark-closed sessions") {
    import spark.implicits._
    val srcDir = tmp("graft_sess_src")
    table("events").write.mode("overwrite").parquet(srcDir)

    val streamEvents = IncrementalSync.eventsStream(spark, srcDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_time"), col("value"))
      .as[SessEvent]
    val outDir = tmp("graft_sess_out")
    Sessionize.stream(streamEvents, GapUs, watermark = "30 minutes")
      .writeStream
      .option("checkpointLocation", tmp("graft_sess_ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], id: Long) =>
        b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
      }
      .start()
      .awaitTermination(180000)

    val streamed = spark.read.parquet(s"$outDir/batch=*")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "no sessions closed — watermark never advanced")

    val batchSet = Sessionize.batch(eventsUs, "user_id", "us", "value", "event_id", GapUs)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every emitted session is exactly a batch session (unclosed tails
    // are the only permitted difference)
    val missing = streamed -- batchSet
    assert(missing.isEmpty, s"streamed sessions absent from batch: ${missing.take(5)}")
    // and the stream emitted the bulk of them
    assert(streamed.size >= batchSet.size / 2,
      s"only ${streamed.size} of ${batchSet.size} sessions emitted")
  }
}
