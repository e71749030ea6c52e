package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

/** K4/K5/K7: DDL execution with per-category failure accounting and the
  * reference's append-only log-file sinks (cmd/app.go:110-152,
  * cmd/tablemeta.go:172-186 et al.).
  */
class DdlExecutorSpec extends SparkSpec {
  import spark.implicits._

  private def ddlFrame(stmts: String*) =
    stmts.zipWithIndex.map { case (s, i) => (s"t$i", s) }.toDF("table_name", "sql_cmd")

  test("executeCategory runs every statement tagged, zero failures") {
    val rec = new StatementExecutor.Recording()
    val ex = new DdlExecutor(rec)
    val rep = ex.executeCategory("Index",
      ddlFrame("CREATE INDEX i1 ON t0(a);", "CREATE INDEX i2 ON t1(b);"))
    assert(rep.category === "Index")
    assert(rep.total === 2 && rep.failed === 0)
    assert(rec.executed === Seq(
      "/* graft */ CREATE INDEX i1 ON t0(a);",
      "/* graft */ CREATE INDEX i2 ON t1(b);"))
  }

  test("failures are counted per category and logged to <category>CreateFailed") {
    val dir = Files.createTempDirectory("graft_logs").toString
    val logs = new RunLogs(dir)
    val rec = new StatementExecutor.Recording(failOn = _.contains("i2"))
    val ex = new DdlExecutor(rec, logs)
    val rep = ex.executeCategory("NormalIdx",
      ddlFrame("CREATE INDEX i1 ON t0(f(a));", "CREATE INDEX i2 ON t1(f(b));",
        "CREATE INDEX i3 ON t2(f(c));"))
    assert(rep.total === 3 && rep.failed === 1)
    // execution continued past the failure (reference semantics)
    assert(rec.executed.size === 3)
    val failLines = logs.lines("NormalIdxCreateFailed")
    assert(failLines.size === 1)
    assert(failLines.head.contains("CREATE INDEX i2 ON t1(f(b));"))
    assert(failLines.head.contains("ErrorInfo"))
    // every statement (including the failed one) landed in createSql.log
    assert(logs.lines("createSql").size === 3)
    // and the run narrative recorded the category outcome
    assert(logs.lines("run").exists(l => l.contains("NormalIdx") && l.contains("1 failed")))
  }

  test("metaDataOnly (-m) logs DDL but executes nothing") {
    val dir = Files.createTempDirectory("graft_logs_m").toString
    val logs = new RunLogs(dir)
    val rec = new StatementExecutor.Recording()
    val ex = new DdlExecutor(rec, logs, metaDataOnly = true)
    val rep = ex.executeCategory("Table", ddlFrame("create table t0 (a int);"))
    assert(rep.total === 1 && rep.failed === 0)
    assert(rec.executed.isEmpty)
    assert(logs.lines("createSql") === Seq("create table t0 (a int);"))
  }

  test("executeAll reports one row per category, in order") {
    val ex = new DdlExecutor(new StatementExecutor.Recording())
    val reps = ex.executeAll(Seq(
      "Table" -> ddlFrame("create table a (x int);"),
      "Index" -> ddlFrame("create index i on a(x);"),
      "Comment" -> ddlFrame()))
    assert(reps.map(_.category) === Seq("Table", "Index", "Comment"))
    assert(reps.map(_.total) === Seq(1, 1, 0))
    val df = DdlExecutor.reportDf(spark, reps)
    assert(df.columns.toSeq ===
      Seq("category", "start", "end", "total", "failed", "seconds"))
    assert(df.count() === 3)
  }

  test("end-to-end: generated object DDL executes through the sink") {
    // generation distributes (ObjectMigrator), execution accounts — the
    // reference's full create-objects pass (cmd/create.go:80-101)
    val comments = Seq(("t1", "first"), ("t2", null), ("t3", "third"))
      .toDF("table_name", "comments")
    val ddl = graft.objects.ObjectMigrator.commentDdl(comments)
    val rec = new StatementExecutor.Recording()
    val rep = new DdlExecutor(rec).executeCategory("Comment", ddl)
    assert(rep.total === 2 && rep.failed === 0)
    assert(rec.executed.forall(_.startsWith("/* graft */ alter table ")))
  }

  test("datedUnder creates the reference-shaped per-run log directory") {
    val base = Files.createTempDirectory("graft_dated").toString
    val logs = RunLogs.datedUnder(base)
    logs.run("started")
    val logRoot = new java.io.File(base, "log")
    val runs = logRoot.listFiles()
    assert(runs.length === 1)
    assert(runs(0).getName.matches("\\d{4}_\\d{2}_\\d{2}_\\d{2}_\\d{2}_\\d{2}"))
    assert(logs.lines("run") === Seq("started"))
  }
}
