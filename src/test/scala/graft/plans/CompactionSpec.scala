package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compactParquet: many batch files collapse, layout preserved, a resumed stream stays readable") {
    import spark.implicits._
    // trailing slash exercised on purpose: sibling temp paths must not
    // become children of the dataset
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/events/"
    // simulate a streaming sink's accumulation: 12 tiny per-batch writes
    (0 until 12).foreach { b =>
      (0 until 50).map(i => (b * 50L + i, s"payload $b $i"))
        .toDF("id", "v").repartition(2)
        .write.parquet(s"${dir}batch=$b")
    }
    val pre = spark.read.parquet(dir)
      .orderBy("id").collect().map(_.toString).toSeq
    val (before, after) = Compaction.compactParquet(spark, dir,
      targetFileBytes = 512L << 20)
    assert(before === 24L, s"before=$before")
    assert(after < before, s"after=$after")
    val post = spark.read.parquet(dir)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(post === pre)
    // the batch= partition LAYOUT survives (not just the column), so a
    // resumed stream appending a new batch= directory keeps the
    // dataset readable
    assert(spark.read.parquet(dir).columns.contains("batch"))
    (600 until 650).map(i => (i.toLong, s"payload 12 $i"))
      .toDF("id", "v").write.parquet(s"${dir}batch=12")
    val resumed = spark.read.parquet(dir)
    assert(resumed.count() === 650)
    assert(resumed.filter(col("batch") === 12).count() === 50)
  }

  test("compactParquet: target sizing yields multiple files when bytes demand it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (0 until 20000).map(i => (i.toLong, ("x" * 100) + i))
      .toDF("id", "v").repartition(40)
      .write.parquet(dir)
    // ~ a few hundred KB of parquet; 64 KiB target forces several files
    val (_, after) = Compaction.compactParquet(spark, dir, targetFileBytes = 64L << 10)
    assert(after > 2, s"after=$after")
    assert(spark.read.parquet(dir).count() === 20000L)
  }
}
