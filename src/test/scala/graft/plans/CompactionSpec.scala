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

  test("deleteWhere: rows vanish, partition layout survives, z-ordered datasets are refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString + "/corpus"
    (0 until 4).foreach { b =>
      (0 until 100).map(i => (b * 100L + i, s"doc $b $i"))
        .toDF("id", "v").write.parquet(s"$dir/batch=$b")
    }
    val (before, after) = Compaction.deleteWhere(spark, dir, col("id") % 4 === 0)
    assert(before === 400L && after === 300L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 300L)
    assert(back.filter(col("id") % 4 === 0).count() === 0L)
    // the batch= layout survives the rewrite, so a resumed writer keeps
    // appending partition dirs
    assert(back.columns.contains("batch"))
    // appended ids ≡ 1 (mod 4), so the idempotency re-delete below has
    // genuinely nothing to remove
    (0 until 10).map(i => (9001L + i * 4, s"doc 4 $i"))
      .toDF("id", "v").write.parquet(s"$dir/batch=4")
    assert(spark.read.parquet(dir).count() === 310L)
    // idempotent: deleting already-deleted rows is a no-op rewrite
    val (b2, a2) = Compaction.deleteWhere(spark, dir, col("id") % 4 === 0)
    assert(b2 === a2)
    // a clustered dataset must go through the layout-preserving verb
    val zdir = java.nio.file.Files.createTempDirectory("graft_delz").toString + "/z"
    graft.plans.ZOrder.zorderWrite(
      (0 until 100).map(i => (i.toLong, i.toLong * 2)).toDF("a", "b"),
      Seq("a", "b"), zdir, numFiles = 2)
    val ex = intercept[IllegalArgumentException] {
      Compaction.deleteWhere(spark, zdir, col("a") === 0)
    }
    assert(ex.getMessage.contains("deleteWhereZorder"), ex.getMessage)
  }

  test("deleteWhere / deleteWhereZorder: NULL-evaluating predicates keep their rows — SQL DELETE semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delnull").toString + "/t"
    Seq((1L, Some("en")), (2L, None), (3L, Some("de")), (4L, Some("en")))
      .toDF("id", "lang").write.parquet(dir)
    // lang === 'en' is NULL for row 2: it must SURVIVE, not silently
    // delete with the matches
    val (before, after) = Compaction.deleteWhere(spark, dir, col("lang") === "en")
    assert(before === 4L && after === 2L)
    val back = spark.read.parquet(dir).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(back.head.isNullAt(1))
    // same contract on the clustered verb
    val zdir = java.nio.file.Files.createTempDirectory("graft_delnullz").toString + "/z"
    val zdf = Seq((1L, 10L, Some("en")), (2L, 20L, None), (3L, 30L, Some("de")))
      .toDF("a", "b", "lang")
    graft.plans.ZOrder.zorderWrite(zdf, Seq("a", "b"), zdir, numFiles = 2)
    graft.plans.ZOrder.deleteWhereZorder(spark, zdir, col("lang") === "en", numFiles = 2)
    val zback = spark.read.parquet(zdir)
    assert(zback.count() === 2L)
    assert(zback.filter(col("lang").isNull).count() === 1L)
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

  test("compactBucketedTable: replay-duplicate rows drop, bucket spec + metadata survive, queries unchanged") {
    import spark.implicits._
    import graft.operators.Dedup
    def phrase(tag: String) = (1 to 25).map(t => s"${tag}w$t").mkString(" ")
    val hist = (0 until 20).map(i => (i.toLong, phrase(s"cbt$i"))).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(hist, "doc_id", "text", "cbt_idx", buckets = 4)
    val batch = (100 until 110).map(i => (i.toLong, phrase(s"cbtb$i"))).toDF("doc_id", "text")
    Dedup.appendToMinhashIndex(spark, "cbt_idx", batch, "doc_id", "text")
    // a replayed epoch re-appends byte-identical signature rows
    Dedup.appendToMinhashIndex(spark, "cbt_idx", batch, "doc_id", "text")
    assert(spark.table("cbt_idx").count() === 40)
    // the telemetry reads the residue exactly: 10 of 40 rows are
    // replay duplicates
    val stats = Dedup.minhashIndexStats(spark, "cbt_idx")
    assert(stats.totalRows === 40L && stats.distinctRows === 30L, stats.toString)
    assert(math.abs(stats.duplicateFraction - 0.25) < 1e-9)
    assert(stats.maxBucketRows >= 2L, stats.toString)
    val q = Seq((1000L, phrase("cbt3"))).toDF("doc_id", "text")
    val pre = Dedup.portableMinhashPairsAgainstIndex(spark, "cbt_idx", q,
      "doc_id", "text", 3, 8, 0.75).collect().map(_.toString).sorted.toSeq
    assert(pre.nonEmpty)
    val (before, after) = Compaction.compactBucketedTable(spark, "cbt_idx")
    assert(before === 40L && after === 30L, s"$before -> $after")
    // compaction drops exactly the residue the telemetry counted
    val cleaned = Dedup.minhashIndexStats(spark, "cbt_idx")
    assert(cleaned.totalRows === 30L && cleaned.duplicateFraction === 0.0, cleaned.toString)
    // the bucket spec survived the rewrite
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("cbt_idx"))
      .bucketSpec
    assert(spec.exists(_.numBuckets === 4))
    // column metadata (stamped shingle width) survived: appends still validate
    Dedup.appendToMinhashIndex(spark, "cbt_idx",
      Seq((200L, phrase("cbtn"))).toDF("doc_id", "text"), "doc_id", "text")
    // and the index answers exactly as before
    val post = Dedup.portableMinhashPairsAgainstIndex(spark, "cbt_idx", q,
      "doc_id", "text", 3, 8, 0.75).collect().map(_.toString).sorted.toSeq
    assert(post === pre)
  }

  test("isStaleMinhashIndex: replay residue flips it, compaction clears it; a dup-cluster append flips skew, dedup+rebuild clears it") {
    import spark.implicits._
    import graft.operators.Dedup
    def phrase(tag: String) = (1 to 25).map(t => s"${tag}w$t").mkString(" ")
    val hist = (0 until 20).map(i => (i.toLong, phrase(s"st$i"))).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(hist, "doc_id", "text", "stale_idx", buckets = 4)
    assert(!Dedup.isStaleMinhashIndex(spark, "stale_idx"))

    // ---- signal 1: replay residue. Three replays of one epoch leave
    // 30 duplicate rows of 50: duplicateFraction 0.4 > the 0.25 default
    val batch = (100 until 110).map(i => (i.toLong, phrase(s"stb$i"))).toDF("doc_id", "text")
    (1 to 3).foreach(_ =>
      Dedup.appendToMinhashIndex(spark, "stale_idx", batch, "doc_id", "text"))
    val residueStats = Dedup.minhashIndexStats(spark, "stale_idx")
    assert(residueStats.totalRows === 50L && residueStats.distinctRows === 30L,
      residueStats.toString)
    assert(Dedup.isStaleMinhashIndex(spark, "stale_idx"))
    // the documented remediation for THIS signal: compaction drops
    // exactly the residue, no signature recompute
    graft.plans.Compaction.compactBucketedTable(spark, "stale_idx")
    assert(!Dedup.isStaleMinhashIndex(spark, "stale_idx"))

    // ---- signal 2: a boilerplate cluster — 30 DISTINCT ids sharing one
    // text, so 30 rows land on one blocking key (skew 30 × mean ≈ 1).
    // Compaction cannot clear this (the rows are distinct)
    val boiler = (200 until 230).map(i => (i.toLong, phrase("same"))).toDF("doc_id", "text")
    Dedup.appendToMinhashIndex(spark, "stale_idx", boiler, "doc_id", "text")
    assert(Dedup.isStaleMinhashIndex(spark, "stale_idx", maxBucketSkew = 10.0))
    graft.plans.Compaction.compactBucketedTable(spark, "stale_idx")
    assert(Dedup.isStaleMinhashIndex(spark, "stale_idx", maxBucketSkew = 10.0),
      "distinct-id dup clusters must survive compaction — that is why the recipe is dedup+rebuild")
    // the documented remediation: dedup the corpus, rebuild the index
    val corpus = hist.union(batch).union(boiler)
    val deduped = Dedup.exact(corpus, "doc_id", "text")
    spark.sql("DROP TABLE stale_idx")
    Dedup.writeMinhashIndex(deduped, "doc_id", "text", "stale_idx", buckets = 4)
    assert(!Dedup.isStaleMinhashIndex(spark, "stale_idx", maxBucketSkew = 10.0))
    val rebuilt = Dedup.minhashIndexStats(spark, "stale_idx")
    assert(rebuilt.totalRows === 31L, rebuilt.toString) // 20 + 10 + 1 survivor
    spark.sql("DROP TABLE stale_idx")
  }

  test("compactBucketedTable: a temp view shadowing the table name is refused untouched") {
    import spark.implicits._
    import graft.operators.Dedup
    def phrase(tag: String) = (1 to 25).map(t => s"${tag}s$t").mkString(" ")
    val hist = (0 until 5).map(i => (i.toLong, phrase(s"sh$i"))).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(hist, "doc_id", "text", "cbt_shadow", buckets = 2)
    spark.range(3).toDF("x").createOrReplaceTempView("cbt_shadow")
    try {
      val e = intercept[IllegalArgumentException] {
        Compaction.compactBucketedTable(spark, "cbt_shadow")
      }
      assert(e.getMessage.contains("temp view"))
    } finally spark.catalog.dropTempView("cbt_shadow")
    assert(spark.table("cbt_shadow").count() === 5)
  }

  test("compactBucketedTable: crash states — old-present recovers, both-present refuses") {
    import spark.implicits._
    import graft.operators.Dedup
    def phrase(tag: String) = (1 to 25).map(t => s"${tag}c$t").mkString(" ")
    val hist = (0 until 10).map(i => (i.toLong, phrase(s"cc$i"))).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(hist, "doc_id", "text", "cbt_crash", buckets = 2)
    // stage the death-between-renames state: table moved aside, nothing installed
    spark.sql("ALTER TABLE cbt_crash RENAME TO cbt_crash__compact_old")
    val (before, after) = Compaction.compactBucketedTable(spark, "cbt_crash")
    assert(before === 10L && after === 10L)
    assert(spark.table("cbt_crash").count() === 10)
    assert(!spark.catalog.tableExists("cbt_crash__compact_old"))
    // both present is ambiguous: refuse, touch neither
    spark.table("cbt_crash").limit(3).write.format("parquet")
      .saveAsTable("cbt_crash__compact_old")
    val e = intercept[IllegalStateException] {
      Compaction.compactBucketedTable(spark, "cbt_crash")
    }
    assert(e.getMessage.contains("refusing"))
    assert(spark.table("cbt_crash").count() === 10)
    assert(spark.table("cbt_crash__compact_old").count() === 3)
    // missing entirely fails fast
    intercept[java.util.NoSuchElementException] {
      Compaction.compactBucketedTable(spark, "cbt_absent")
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

  test("upsertParquet: matched keys replace, unmatched insert, layout survives, counts exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ups").toString + "/corpus"
    (0 until 2).foreach { b =>
      (0 until 100).map(i => (b * 100L + i, s"doc $b $i", b))
        .toDF("id", "v", "b").write.parquet(s"$dir/batch=$b")
    }
    // 10 updates (ids 0,10..90 exist) + 5 inserts (ids 1000..1004).
    // The batch carries the PARTITION column too (the base's read
    // schema includes it) — columns deliberately reordered and
    // re-cased: the merge aligns by the session resolver, not by
    // position
    val updates = ((0 until 10).map(i => (s"REVISED $i", i * 10L, 0, i % 2)) ++
      (0 until 5).map(i => (s"NEW $i", 1000L + i, 9, 1)))
      .toDF("V", "ID", "B", "BATCH")
    val (before, replaced, after) =
      Compaction.upsertParquet(spark, dir, updates, Seq("id"))
    assert(before === 200L && replaced === 10L && after === 205L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 205L)
    assert(back.filter(col("v").startsWith("REVISED")).count() === 10L)
    assert(back.filter(col("id") >= 1000L).count() === 5L)
    assert(back.filter(col("id") === 50L).select("v").head.getString(0) === "REVISED 5")
    // untouched rows byte-identical, batch= partition layout intact
    assert(back.filter(col("id") === 51L).select("v").head.getString(0) === "doc 0 51")
    assert(back.columns.contains("batch"))
    // idempotent re-apply: same batch again replaces 15, inserts 0
    val (b2, r2, a2) = Compaction.upsertParquet(spark, dir, updates, Seq("id"))
    assert(b2 === 205L && r2 === 15L && a2 === 205L)
    assert(spark.read.parquet(dir).count() === 205L)
  }

  test("upsertParquet: ambiguous batches, schema drift, bad keys and clustered datasets are refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ups2").toString + "/t"
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(dir)
    // duplicate keys in the batch = ambiguous merge
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, dir, dup, Seq("id"))
    }
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // schema not covering the base columns
    val skinny = Seq((1L, "a")).toDF("id", "w")
    val e2 = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, dir, skinny, Seq("id"))
    }
    assert(e2.getMessage.contains("does not cover"), e2.getMessage)
    // key column absent from the dataset
    val e3 = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, dir,
        Seq((1L, "a")).toDF("id", "v"), Seq("nope"))
    }
    assert(e3.getMessage.contains("not a column"), e3.getMessage)
    // refusals left the dataset untouched
    assert(spark.read.parquet(dir).count() === 50L)
    // clustered datasets route through the z-order verbs
    val zdir = java.nio.file.Files.createTempDirectory("graft_upsz").toString + "/z"
    graft.plans.ZOrder.zorderWrite(
      (0 until 100).map(i => (i.toLong, i.toLong * 2)).toDF("a", "b"),
      Seq("a", "b"), zdir, numFiles = 2)
    val e4 = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, zdir,
        Seq((1L, 2L)).toDF("a", "b"), Seq("a"))
    }
    assert(e4.getMessage.contains("z-order"), e4.getMessage)
  }

  test("upsertParquet: additive schema evolution behind allowNewColumns; strict mode refuses new columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ups4").toString + "/t"
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(dir)
    val evolved = Seq((5L, "REV 5", 0.9), (100L, "NEW", 0.1)).toDF("id", "v", "score")
    // strict mode: a new column is refused, not silently dropped
    val e = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, dir, evolved, Seq("id"))
    }
    assert(e.getMessage.contains("allowNewColumns"), e.getMessage)
    assert(!spark.read.parquet(dir).columns.contains("score"))
    // evolution: column appends, pre-existing rows read null there
    val (before, replaced, after) = Compaction.upsertParquet(
      spark, dir, evolved, Seq("id"), allowNewColumns = true)
    assert(before === 20L && replaced === 1L && after === 21L)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSeq === Seq("id", "v", "score"))
    assert(back.filter(col("score").isNull).count() === 19L)
    assert(back.filter(col("id") === 5L).select("score").head.getDouble(0) === 0.9)
    // next batch must now cover the evolved schema too
    val e2 = intercept[IllegalArgumentException] {
      Compaction.upsertParquet(spark, dir, Seq((6L, "x")).toDF("id", "v"), Seq("id"))
    }
    assert(e2.getMessage.contains("does not cover"), e2.getMessage)
  }

  test("upsertParquet: the batch side of the anti-join broadcasts — the base never shuffles for a small CDC batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ups5").toString + "/t"
    (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(dir)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Compaction.upsertParquet(spark, dir,
        Seq((1L, "REV"), (9999L, "NEW")).toDF("id", "v"), Seq("id"))
      // the listener fires asynchronously: poll until the merge plan lands
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!plans.toArray.exists(_.toString.contains("LeftAnti")) &&
          System.nanoTime() < deadline) Thread.sleep(100)
      val merge = plans.toArray.map(_.toString).filter(_.contains("LeftAnti"))
      assert(merge.nonEmpty, "no anti-join plan captured")
      assert(merge.exists(p => p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop")),
        s"anti-join did not broadcast the batch:\n${merge.head.take(2000)}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("upsertParquet: null keys match null-keyed rows (null-safe equality), not silently duplicate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ups3").toString + "/t"
    Seq((Some(1L), "one"), (None, "null-row"), (Some(2L), "two"))
      .toDF("id", "v").write.parquet(dir)
    val updates = Seq((None: Option[Long], "null-revised")).toDF("id", "v")
    val (before, replaced, after) =
      Compaction.upsertParquet(spark, dir, updates, Seq("id"))
    assert(before === 3L && replaced === 1L && after === 3L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 3L)
    assert(back.filter(col("id").isNull).select("v").head.getString(0) === "null-revised")
  }
}
