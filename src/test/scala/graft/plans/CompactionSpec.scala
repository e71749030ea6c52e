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

  test("compactParquet: crash between the install renames — re-run recovers __compact_old, zero data loss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_crash").toString + "/t"
    (0 until 500).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    val pre = spark.read.parquet(dir).orderBy("id").collect().map(_.toString).toSeq
    // stage the documented process-death state: dir renamed aside to
    // __compact_old, nothing installed at dir (death between the two
    // renames); a stale __compact_tmp may also be present
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val old = new org.apache.hadoop.fs.Path(qualified.getParent, qualified.getName + "__compact_old")
    val tmp = new org.apache.hadoop.fs.Path(qualified.getParent, qualified.getName + "__compact_tmp")
    assert(fs.rename(qualified, old))
    fs.mkdirs(tmp)
    assert(!fs.exists(qualified) && fs.exists(old))
    // re-running the compactor must recover the only surviving copy,
    // not delete it
    val (before, after) = Compaction.compactParquet(spark, dir, targetFileBytes = 512L << 20)
    assert(before === 8L, s"before=$before")
    assert(after < before)
    assert(!fs.exists(old) && !fs.exists(tmp))
    val post = spark.read.parquet(dir).orderBy("id").collect().map(_.toString).toSeq
    assert(post === pre)
  }

  test("compactParquet: dir and __compact_old both present — refuses loudly, touches neither copy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_both").toString + "/t"
    (0 until 100).map(i => (i.toLong, s"new $i")).toDF("id", "v").write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val old = new org.apache.hadoop.fs.Path(qualified.getParent, qualified.getName + "__compact_old")
    (0 until 100).map(i => (i.toLong, s"old $i")).toDF("id", "v").write.parquet(old.toString)
    val preDir = spark.read.parquet(dir).orderBy("id").collect().map(_.toString).toSeq
    val preOld = spark.read.parquet(old.toString).orderBy("id").collect().map(_.toString).toSeq
    val ex = intercept[java.io.IOException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(ex.getMessage.contains("refusing"))
    // both copies survive untouched for the operator to adjudicate
    assert(spark.read.parquet(dir).orderBy("id").collect().map(_.toString).toSeq === preDir)
    assert(spark.read.parquet(old.toString).orderBy("id").collect().map(_.toString).toSeq === preOld)
  }

  test("compactParquet: missing dataset with no recovery copy fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_none").toString + "/absent"
    intercept[java.io.FileNotFoundException] {
      Compaction.compactParquet(spark, dir)
    }
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
