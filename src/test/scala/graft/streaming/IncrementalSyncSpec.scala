package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSyncSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("end-to-end incremental sync drains the fixture events into batched parquet") {
    // stage the fixture as a "source feed" directory
    val srcDir = tmp("graft_stream_src")
    table("events").write.mode("overwrite").parquet(srcDir)

    val destDir = tmp("graft_stream_dest")
    val q = IncrementalSync.start(
      IncrementalSync.eventsStream(spark, srcDir),
      destDir,
      tmp("graft_stream_ckpt")
    )
    q.awaitTermination(120000)

    val synced = spark.read.parquet(s"$destDir/batch=*")
    assert(synced.count() === table("events").count())
    // event_time column materialized as a real timestamp
    assert(synced.schema("event_time").dataType.typeName === "timestamp")
  }

  test("restart with same checkpoint does not duplicate rows (exactly-once)") {
    val srcDir = tmp("graft_stream_src2")
    table("events").write.mode("overwrite").parquet(srcDir)
    val destDir = tmp("graft_stream_dest2")
    val ckpt = tmp("graft_stream_ckpt2")

    IncrementalSync.start(IncrementalSync.eventsStream(spark, srcDir), destDir, ckpt)
      .awaitTermination(120000)
    // second run: nothing new to process
    IncrementalSync.start(IncrementalSync.eventsStream(spark, srcDir), destDir, ckpt)
      .awaitTermination(120000)

    assert(spark.read.parquet(s"$destDir/batch=*").count() === table("events").count())
  }

  test("hourly rollup aggregates with event-time windows") {
    val srcDir = tmp("graft_stream_src3")
    table("events").write.mode("overwrite").parquet(srcDir)
    val destDir = tmp("graft_stream_dest3")

    val rollup = IncrementalSync.hourlyRollup(
      IncrementalSync.eventsStream(spark, srcDir))
    val q = rollup.writeStream
      .option("checkpointLocation", tmp("ckpt3"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$destDir/batch=$id")
      }
      .start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$destDir/batch=*")
    // watermark holds back the last open hour in append mode; everything
    // emitted must match the batch ground truth
    val batch = table("events")
      .select(col("ts").as("event_time"),
        col("event_type"), col("value"))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val emitted = out.select("window", "event_type", "n_events")
      .collect().map(_.toString).toSet
    val truth = batch.select("window", "event_type", "n_events")
      .collect().map(_.toString).toSet
    assert(emitted.subsetOf(truth))
    assert(emitted.nonEmpty)
  }

  test("streaming dedup removes duplicate event ids") {
    val srcDir = tmp("graft_stream_src4")
    val ev = table("events").limit(100)
    ev.union(ev).write.mode("overwrite").parquet(srcDir) // feed with dups
    val destDir = tmp("graft_stream_dest4")

    val deduped = IncrementalSync.dedupedStream(
      IncrementalSync.eventsStream(spark, srcDir), "event_id")
    val q = deduped.writeStream
      .option("checkpointLocation", tmp("ckpt4"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$destDir/batch=$id")
      }
      .start()
    q.awaitTermination(120000)

    assert(spark.read.parquet(s"$destDir/batch=*").count() === 100)
  }
}
