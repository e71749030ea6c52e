package graft.sinks

import java.sql.Types
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.RangeScan
import graft.sources.JdbcSource

/** End-to-end exercise of the PRODUCTION JDBC path — the code a real
  * user hits first (reference cmd/root.go:264-273, 343-526;
  * cmd/app.go:42-108) — against the recording [[FakeJdbc]] endpoint:
  * catalog scan, planner-partitioned range reads with a disjoint-cover
  * check on REAL predicate evaluation, truncate-before-load batched
  * writes with clamp/isolation assertions, create-on-missing, and the
  * idempotent range-replay protocol.
  */
class FakeJdbcSpec extends SparkSpec {

  private val url = FakeJdbc.Prefix + "testdb"

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", classOf[FakeJdbcDriver].getName)
    p
  }

  // DriverManager registration covers the code paths that look the
  // driver up by URL instead of by class name (writeJdbcRangeIdempotent)
  java.sql.DriverManager.registerDriver(new FakeJdbcDriver)

  private val empCols = Seq(
    FakeJdbc.Col("id", Types.BIGINT), FakeJdbc.Col("val", Types.VARCHAR))
  private val empRows: Seq[Seq[Any]] =
    (0L until 100L).map(i => Seq[Any](i, s"row$i"))

  test("catalog scan: tableNames runs the user_tables dictionary query") {
    FakeJdbc.reset(Map("emp" -> (empCols, empRows)))
    val src = JdbcSource(url, props)
    assert(src.tableNames(spark) === Seq("emp"))
    assert(FakeJdbc.statements.exists(s =>
      s.startsWith("QUERY") && s.contains("user_tables") && !s.contains("1=0")),
      s"no dictionary scan in:\n${FakeJdbc.statements.mkString("\n")}")
  }

  test("partitioned range read: one disjoint page predicate per Spark partition, exact cover") {
    FakeJdbc.reset(Map("emp" -> (empCols, empRows)))
    val src = JdbcSource(url, props, pageSize = 30L)
    val plan = src.planScan(rows = 100L, splitKey = Some(("id", 0L, 99L)))
    val ranges = plan.asInstanceOf[RangeScan]
    assert(ranges.predicates.length === 4) // ceil(100/30)

    val df = src.tablePartitioned(spark, "emp", plan)
    // the fake EVALUATES the predicates, so exact-once coverage below is
    // evidence the pages are disjoint and complete — not an artifact
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.length === 100, "pages must cover every row exactly once")
    assert(got.map(_._1).sorted.toSeq === (0L until 100L).toSeq)
    assert(df.rdd.getNumPartitions === 4, "one Spark partition per page")
    // every page predicate reached the endpoint as SQL
    ranges.predicates.foreach { pred =>
      assert(FakeJdbc.statements.exists(s => s.startsWith("QUERY") && s.contains(pred)),
        s"predicate [$pred] never hit the source:\n${FakeJdbc.statements.mkString("\n")}")
    }
  }

  test("writeJdbc: truncate-first, clamped batches, READ_COMMITTED, capped partitions") {
    import spark.implicits._
    FakeJdbc.reset(Map("dest_out" -> (empCols, Seq.empty)))
    val df = (0L until 2500L).map(i => (i, s"v$i")).toDF("id", "val").repartition(8)
    BatchWriter.writeJdbc(df, url, "dest_out", props,
      batchRowSize = 1000, maxConnections = 2, truncateFirst = true)

    val st = FakeJdbc.statements
    // K3: destination truncated, never dropped (schema survives)
    assert(st.exists(s => s.startsWith("UPDATE") && s.toUpperCase.contains("TRUNCATE TABLE")),
      s"no truncate in:\n${st.mkString("\n")}")
    assert(!st.exists(_.toUpperCase.contains("DROP TABLE")))
    // K1: prepared multi-row INSERT per write partition; connection
    // budget caps 8 input partitions to 2 writers
    val inserts = st.filter(s => s.startsWith("PREPARE") && s.toUpperCase.contains("INSERT INTO"))
    assert(inserts.size === 2, s"expected 2 write partitions, got:\n${inserts.mkString("\n")}")
    assert(inserts.forall(s => s.contains("\"id\"") && s.contains("\"val\"") && s.contains("?")),
      s"insert must bind quoted columns with placeholders:\n${inserts.head}")
    // K2: every executed batch respects the clamp; nothing is lost
    val batches = st.collect { case s if s.startsWith("EXECUTE BATCH n=") =>
      s.stripPrefix("EXECUTE BATCH n=").toInt }
    assert(batches.nonEmpty && batches.forall(_ <= 1000),
      s"batch exceeded clamp: $batches")
    assert(batches.sum === 2500)
    assert(FakeJdbc.writtenRows.size === 2500)
    assert(FakeJdbc.writtenRows.map(_.head.asInstanceOf[Long]).sorted === (0L until 2500L))
    // isolation pinned to READ_COMMITTED on the write connections
    assert(st.contains(s"SET ISOLATION ${java.sql.Connection.TRANSACTION_READ_COMMITTED}"),
      s"no isolation set in:\n${st.filter(_.startsWith("SET")).mkString("\n")}")
    assert(st.contains("COMMIT"))
  }

  test("writeJdbc append to a missing table emits CREATE TABLE with the frame's schema") {
    import spark.implicits._
    FakeJdbc.reset() // no tables: existence probe fails -> create path
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "val")
    BatchWriter.writeJdbc(df, url, "fresh_tbl", props,
      batchRowSize = 10, maxConnections = 1, truncateFirst = false)
    val create = FakeJdbc.statements.find(s =>
      s.startsWith("UPDATE") && s.toUpperCase.contains("CREATE TABLE"))
    assert(create.isDefined, s"no create in:\n${FakeJdbc.statements.mkString("\n")}")
    assert(create.get.contains("\"id\"") && create.get.contains("\"val\""),
      s"created DDL must carry the frame's columns: ${create.get}")
    assert(FakeJdbc.writtenRows.size === 2)
  }

  test("idempotent range replay: DELETE precedes each load, only in-range rows bind") {
    import spark.implicits._
    FakeJdbc.reset(Map("replay_tbl" -> (empCols, Seq.empty)))
    val df = (0L until 50L).map(i => (i, s"v$i")).toDF("id", "val")
    def loadRange(): Unit = BatchWriter.writeJdbcRangeIdempotent(
      df, url, "replay_tbl", props, rangeCol = "id", lo = 10L, hi = 20L,
      batchRowSize = 100, maxConnections = 1)
    loadRange()
    loadRange() // simulated retry of the same page

    val deletes = FakeJdbc.statements.zipWithIndex.filter(_._1 ==
      "UPDATE " + BatchWriter.deleteRangeSql("replay_tbl", "id", 10L, 20L))
    assert(deletes.size === 2, "each replay must re-delete its range first")
    // each delete precedes its insert wave
    val batchIdxs = FakeJdbc.statements.zipWithIndex
      .filter(_._1.startsWith("EXECUTE BATCH")).map(_._2)
    assert(deletes.head._2 < batchIdxs.head)
    assert(deletes(1)._2 > batchIdxs.head && deletes(1)._2 < batchIdxs.last)
    // only the [10,20) page binds — the range filter runs source-side
    val ids = FakeJdbc.writtenRows.map(_.head.asInstanceOf[Long])
    assert(ids.size === 20 && ids.toSet === (10L until 20L).toSet,
      s"out-of-range rows bound: ${ids.sorted}")
  }
}
