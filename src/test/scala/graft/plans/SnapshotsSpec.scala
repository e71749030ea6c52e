package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {

  private def freshCorpus(prefix: String, n: Int = 90): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString + "/corpus"
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("id", "v")
      .write.parquet(dir)
    dir
  }

  test("versioned rewrites: every maintenance verb archives its pre-state; time travel reads each") {
    import spark.implicits._
    val dir = freshCorpus("graft_snap")
    Snapshots.enableVersioning(spark, dir)
    assert(Snapshots.isVersioned(spark, dir))
    assert(Snapshots.listVersions(spark, dir).count() === 0L)

    // v1 <- original (delete archives it)
    Compaction.deleteWhere(spark, dir, col("id") % 3 === 0)
    // v2 <- post-delete (upsert archives it)
    val updates = Seq((1L, "REV 1"), (5000L, "NEW")).toDF("id", "v")
    Compaction.upsertParquet(spark, dir, updates, Seq("id"))
    // v3 <- post-upsert (compaction archives it, content-identical to live)
    Compaction.compactParquet(spark, dir)

    val versions = Snapshots.listVersions(spark, dir).collect()
    assert(versions.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(versions.map(_.getString(1)).toSeq === Seq("delete", "upsert", "compact"))
    assert(versions.forall(!_.isNullAt(2)))

    assert(Snapshots.readVersion(spark, dir, 1L).count() === 90L)
    val v2 = Snapshots.readVersion(spark, dir, 2L)
    assert(v2.count() === 60L)
    assert(v2.filter(col("v") === "REV 1").count() === 0L)
    val live = spark.read.parquet(dir)
    assert(live.count() === 61L)
    assert(live.filter(col("v") === "REV 1").count() === 1L)
    // v3 is the same rows as live, just pre-compaction files
    assert(Snapshots.readVersion(spark, dir, 3L).orderBy("id").collect().toSeq ===
      live.orderBy("id").collect().toSeq)
    // filters still push into an archived version's scan
    val plan = Snapshots.readVersion(spark, dir, 1L)
      .filter(col("id") === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(id)"), plan)
  }

  test("rollbackTo: restores a snapshot, archives the pre-rollback live, and is itself reversible") {
    import spark.implicits._
    val dir = freshCorpus("graft_rb")
    Snapshots.enableVersioning(spark, dir)
    Compaction.deleteWhere(spark, dir, col("id") < 30) // v1 = original, live = 60 rows
    val archivedAs = Snapshots.rollbackTo(spark, dir, 1L)
    assert(archivedAs === 2L)
    // live is the original again; v1's slot emptied (it moved to live),
    // v2 is the pre-rollback 60-row state
    assert(spark.read.parquet(dir).count() === 90L)
    val nums = Snapshots.listVersions(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(nums === Seq(2L))
    assert(Snapshots.readVersion(spark, dir, 2L).count() === 60L)
    // the restored live carries no _version_info residue
    assert(!spark.read.parquet(dir).columns.contains("version"))
    // roll forward again: rollback is reversible
    Snapshots.rollbackTo(spark, dir, 2L)
    assert(spark.read.parquet(dir).count() === 60L)
    assert(Snapshots.readVersion(spark, dir, 3L).count() === 90L)
    // unknown version fails loudly, live untouched
    val e = intercept[IllegalArgumentException] {
      Snapshots.rollbackTo(spark, dir, 99L)
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    assert(spark.read.parquet(dir).count() === 60L)
  }

  test("rollbackTo: idempotent across a mid-rename death — rerun completes the restore") {
    import spark.implicits._
    val dir = freshCorpus("graft_rbc")
    Snapshots.enableVersioning(spark, dir)
    Compaction.deleteWhere(spark, dir, col("id") < 30) // v1 = original
    // simulate death AFTER archiving live (as v2) but BEFORE installing
    // v1: live is gone, both versions on disk
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(path)
    val root = Snapshots.versionsRoot(q)
    assert(fs.rename(q, new org.apache.hadoop.fs.Path(root, "v=2")))
    // rerun: archive half skipped (live missing), install half runs
    Snapshots.rollbackTo(spark, dir, 1L)
    assert(spark.read.parquet(dir).count() === 90L)
    assert(Snapshots.listVersions(spark, dir).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("versioned swap crash state: old beside live archives as a -recovered version instead of refusing") {
    import spark.implicits._
    val dir = freshCorpus("graft_rec")
    Snapshots.enableVersioning(spark, dir)
    // simulate a death after install but before archive: a full copy
    // sits at __delete_old beside the live dataset
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(path)
    val old = new org.apache.hadoop.fs.Path(q.getParent, q.getName + "__delete_old")
    spark.read.parquet(dir).filter(col("id") < 10).write.parquet(old.toString)
    // on an UNVERSIONED dataset this state refuses (CompactionSpec) —
    // versioned, the next rewrite adopts the leftover as v1 and runs
    Compaction.deleteWhere(spark, dir, col("id") % 2 === 0)
    val versions = Snapshots.listVersions(spark, dir).collect()
    assert(versions.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(versions.map(_.getString(1)).toSeq === Seq("delete-recovered", "delete"))
    assert(Snapshots.readVersion(spark, dir, 1L).count() === 10L)
    assert(Snapshots.readVersion(spark, dir, 2L).count() === 90L)
    assert(spark.read.parquet(dir).count() === 45L)
  }

  test("diffVersions: deleted/updated/inserted labels across any two readable states") {
    import spark.implicits._
    val dir = freshCorpus("graft_diff")
    Snapshots.enableVersioning(spark, dir)
    Compaction.deleteWhere(spark, dir, col("id") < 10) // v1 = original
    Compaction.upsertParquet(spark, dir,
      Seq((20L, "REVISED"), (500L, "NEW")).toDF("id", "v"), Seq("id")) // v2 = post-delete
    val toLive = Snapshots.diffVersions(spark, dir, 1L, None, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(toLive === ((0L until 10L).map((_, "deleted")).toSet +
      ((20L, "updated")) + ((500L, "inserted"))))
    // between two snapshots: only the delete separates v1 from v2
    val v1v2 = Snapshots.diffVersions(spark, dir, 1L, Some(2L), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1v2 === (0L until 10L).map((_, "deleted")).toSet)
    // v2 → live: the upsert alone
    val v2Live = Snapshots.diffVersions(spark, dir, 2L, None, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v2Live === Set((20L, "updated"), (500L, "inserted")))
  }

  test("vacuumVersions: drops oldest beyond keepLast; vacuumed versions fail loudly on read") {
    import spark.implicits._
    val dir = freshCorpus("graft_vac")
    Snapshots.enableVersioning(spark, dir)
    (1 to 4).foreach(i => Compaction.deleteWhere(spark, dir, col("id") === i.toLong))
    assert(Snapshots.listVersions(spark, dir).count() === 4L)
    val dropped = Snapshots.vacuumVersions(spark, dir, keepLast = 2)
    assert(dropped === Seq(1L, 2L))
    assert(Snapshots.listVersions(spark, dir).collect().map(_.getLong(0)).toSeq === Seq(3L, 4L))
    val e = intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, dir, 1L)
    }
    assert(e.getMessage.contains("vacuumed or never made"), e.getMessage)
    // keepLast larger than retained = no-op
    assert(Snapshots.vacuumVersions(spark, dir, keepLast = 10) === Seq.empty)
  }

  test("unversioned datasets keep the original contract: old copy deleted, no versions root appears") {
    import spark.implicits._
    val dir = freshCorpus("graft_unv")
    Compaction.deleteWhere(spark, dir, col("id") < 10)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(path)
    assert(!fs.exists(Snapshots.versionsRoot(q)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(q.getParent, q.getName + "__delete_old")))
    // versioning a missing dataset is a caller bug
    intercept[IllegalArgumentException] {
      Snapshots.enableVersioning(spark, dir + "_nope")
    }
  }

  test("zorder recluster rides the same contract: a versioned clustered dataset archives pre-recluster state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snapz").toString + "/z"
    ZOrder.zorderWrite(
      (0 until 400).map(i => (i.toLong, (i * 37 % 400).toLong)).toDF("a", "b"),
      Seq("a", "b"), dir, numFiles = 4)
    Snapshots.enableVersioning(spark, dir)
    ZOrder.reclusterZorder(spark, dir, numFiles = 2)
    val versions = Snapshots.listVersions(spark, dir).collect()
    assert(versions.length === 1)
    assert(versions.head.getString(1) === "zorder")
    assert(Snapshots.readVersion(spark, dir, 1L).count() === 400L)
    assert(spark.read.parquet(dir).count() === 400L)
  }
}
