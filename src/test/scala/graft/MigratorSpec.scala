package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.config.SyncConfig
import graft.sources.FixtureSource
import graft.verify.Comparator

/** The §7.2 minimum end-to-end slice: full copy of the sf0.001 source
  * through the engine into a parquet destination, verified by the
  * Comparator (count + checksum), plus tamper detection.
  */
class MigratorSpec extends SparkSpec {

  test("full migration copies every table and compare reports all OK") {
    val dest = Files.createTempDirectory("graft_dest").toString
    val src = FixtureSource(sfDir)
    val m = new Migrator(spark, src, dest, SyncConfig(maxParallel = 4))
    val results = m.run()
    assert(results.nonEmpty)
    assert(results.forall(_.ok), s"failures: ${results.filterNot(_.ok)}")

    val report = m.compare()
    assert(report.filter(col("is_ok") === "NO").count() === 0)
    assert(Comparator.failures(report).count() === 0)

    // deep verification: content checksums match on the largest table
    assert(Comparator.compareChecksums(spark, src, FixtureSource(dest), "lineitem"))
  }

  test("compare detects a tampered destination") {
    val dest = Files.createTempDirectory("graft_dest2").toString
    val src = FixtureSource(sfDir)
    new Migrator(spark, src, dest, SyncConfig()).copyTable("nation")
    // tamper: drop a row
    val tampered = spark.read.parquet(s"$dest/nation.parquet").limit(20)
    tampered.write.mode("overwrite").parquet(s"$dest/nation2.parquet")
    // overwrite in two steps (can't overwrite a path being read)
    spark.read.parquet(s"$dest/nation2.parquet").write.mode("overwrite")
      .parquet(s"$dest/nation.parquet")

    val report = Comparator.compareCounts(spark, src, FixtureSource(dest), Seq("nation"))
    assert(report.filter(col("is_ok") === "NO").count() === 1)
    assert(!Comparator.compareChecksums(spark, src, FixtureSource(dest), "nation"))
  }

  test("columnProfile: one row, stable across copies, ndv within rsd of exact") {
    val li = table("lineitem")
    val p = Comparator.columnProfile(li).collect()
    assert(p.length === 1)
    val row = p(0)
    assert(row.getAs[Long]("rows") === li.count())
    // HLL estimate within the default 5% rsd (generous 3-sigma bound)
    val exactNdv = li.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    val approxNdv = row.getAs[Long]("l_orderkey__ndv")
    assert(math.abs(approxNdv - exactNdv).toDouble / exactNdv < 0.15,
      s"ndv $approxNdv vs $exactNdv")
    // identical content -> identical profile (copy round-trip)
    val dest = Files.createTempDirectory("graft_prof").toString
    li.write.parquet(s"$dest/lineitem.parquet")
    val p2 = Comparator.columnProfile(spark.read.parquet(s"$dest/lineitem.parquet")).collect()(0)
    assert(row.toString === p2.toString)
  }

  test("exactColumnProfile: long format with exact nulls and distincts per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (2L, null), (null, "b"), (null, null)
    ).toDF("k", "s")
    val out = Comparator.exactColumnProfile(df)
      .orderBy("column_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // count(DISTINCT) excludes nulls on every engine; n_rows counts all
    assert(out.toSeq == Seq(
      ("k", 5L, 2L, 2L),
      ("s", 5L, 2L, 2L)))
  }

  test("profileDiff: a collapsed column and a missing column both flag NO") {
    val src = table("orders")
    // destination with o_orderpriority cardinality collapsed (the lossy-
    // transpile shape) and o_orderstatus dropped entirely
    val dest = src
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 2 === 0, lit(null).cast("string"))
          .otherwise(lit("X")))
      .drop("o_orderstatus")
    val out = Comparator.profileDiff(src, dest).collect()
      .map(r => r.getString(0) -> r.getString(r.length - 1)).toMap
    assert(out("o_orderkey") === "YES")
    assert(out("o_totalprice") === "YES")
    assert(out("o_orderpriority") === "NO", "collapsed cardinality must flag")
    assert(out("o_orderstatus") === "NO", "column missing from dest must flag")
    // identical sides are all-YES
    val clean = Comparator.profileDiff(src, src).collect()
    assert(clean.forall(_.getString(clean.head.length - 1) == "YES"))
  }

  test("profileDiff: empty-vs-empty compares identical — n_nulls 0, never NULL") {
    // sum over zero rows is NULL without the coalesce guard, which read
    // as is_ok=NO on two identical empty tables
    val src = table("orders").limit(0)
    val prof = Comparator.exactColumnProfile(src).collect()
    assert(prof.nonEmpty)
    assert(prof.forall(r => !r.isNullAt(2) && r.getLong(1) == 0L &&
      r.getLong(2) == 0L && r.getLong(3) == 0L), prof.mkString(", "))
    val out = Comparator.profileDiff(src, src).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(out.head.length - 1) == "YES"), out.mkString(", "))
  }

  test("compareProfile: case-folded column collisions fail with the columns named") {
    val base = FixtureSource(sfDir)
    // a source whose region table carries two columns differing only in
    // case — lowercase folding would alias both to `k` and every later
    // reference would be ambiguous (or silently doubled in the join)
    val collide = new graft.sources.TableSource {
      override def tableNames(s: org.apache.spark.sql.SparkSession) =
        base.tableNames(s)
      override def table(s: org.apache.spark.sql.SparkSession, name: String) =
        base.table(s, name)
          .select(col("r_regionkey").as("K"), col("r_regionkey").as("k"))
    }
    val dest = Files.createTempDirectory("graft_collide").toString
    val m = new Migrator(spark, collide, dest, SyncConfig())
    val ex = intercept[IllegalArgumentException] { m.compareProfile("region") }
    assert(ex.getMessage.contains("collide") && ex.getMessage.contains("k"),
      ex.getMessage)
  }

  test("compareCounts: a hung table degrades to a TIMEOUT failure row within bound") {
    val src = FixtureSource(sfDir)
    // a source whose `nation` scan never returns — the hung-connection
    // shape the reference would hang the whole process on
    val hung = new graft.sources.TableSource {
      override def tableNames(s: org.apache.spark.sql.SparkSession) =
        src.tableNames(s)
      override def table(s: org.apache.spark.sql.SparkSession, name: String) = {
        if (name == "nation") Thread.sleep(120000)
        src.table(s, name)
      }
    }
    val t0 = System.nanoTime()
    val report = Comparator.compareCounts(spark, hung, src,
      Seq("region", "nation"),
      timeout = scala.concurrent.duration.FiniteDuration(5, "sec"))
    val rows = report.orderBy("table_name").collect() // nation, region
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 60, s"verification must not hang (took $elapsed s)")
    assert(rows(0).getAs[String]("dest_is_exist") === "TIMEOUT")
    assert(rows(0).getAs[String]("is_ok") === "NO")
    assert(rows(0).getAs[Long]("src_rows") === -1L)
    assert(rows(0).getAs[Long]("dest_rows") === -1L)
    // the healthy table still compared normally beside the hung one
    assert(rows(1).getAs[String]("is_ok") === "YES")
    assert(Comparator.failures(report).count() === 1)
  }

  test("compareCounts: a slow DESTINATION times out but the landed source count is reported") {
    val src = FixtureSource(sfDir)
    // destination whose `nation` scan hangs AFTER the source count landed:
    // the failure row must carry the partial fact, not -1
    val slowDest = new graft.sources.TableSource {
      override def tableNames(s: org.apache.spark.sql.SparkSession) =
        src.tableNames(s)
      override def table(s: org.apache.spark.sql.SparkSession, name: String) = {
        if (name == "nation") Thread.sleep(120000)
        src.table(s, name)
      }
    }
    val nationRows = src.table(spark, "nation").count()
    val report = Comparator.compareCounts(spark, src, slowDest,
      Seq("region", "nation"),
      timeout = scala.concurrent.duration.FiniteDuration(8, "sec"))
    val rows = report.orderBy("table_name").collect() // nation, region
    assert(rows(0).getAs[String]("dest_is_exist") === "TIMEOUT")
    assert(rows(0).getAs[String]("is_ok") === "NO")
    assert(rows(0).getAs[Long]("src_rows") === nationRows,
      s"timed-out row must carry the landed source count, got ${rows(0)}")
    assert(rows(0).getAs[Long]("dest_rows") === -1L)
    assert(rows(1).getAs[String]("is_ok") === "YES")
  }

  test("compare flags missing destination tables (DestIsExist=NO)") {
    val dest = Files.createTempDirectory("graft_dest3").toString
    new Migrator(spark, FixtureSource(sfDir), dest).copyTable("region")
    val report = Comparator.compareCounts(
      spark, FixtureSource(sfDir), FixtureSource(dest), Seq("region", "nation"))
    val rows = report.orderBy("table_name").collect()
    assert(rows.map(_.getAs[String]("dest_is_exist")).toSeq === Seq("NO", "YES"))
  }

  test("exclude list removes tables from the run (reference NOT IN filter)") {
    val src = FixtureSource(sfDir)
    val all = src.tableNames(spark)
    val filtered = src.tableNamesExcluding(spark, Set("events", "EMBEDDINGS"))
    assert(all.size - filtered.size === 2)
    assert(!filtered.contains("events") && !filtered.contains("embeddings"))
  }

  test("custom extraction SQL replaces the table scan (reference tables: map)") {
    val dest = Files.createTempDirectory("graft_dest4").toString
    val cfg = SyncConfig(tables = Map(
      "orders" -> Seq("select * from orders where o_orderstatus = 'F'")))
    val m = new Migrator(spark, FixtureSource(sfDir), dest, cfg)
    val r = m.copyTable("orders")
    assert(r.ok)
    val expected = table("orders").filter(col("o_orderstatus") === "F").count()
    assert(r.rows === expected)
    assert(spark.read.parquet(s"$dest/orders.parquet").count() === expected)
  }

  test("schema probe returns columns with zero rows (WHERE 1=0 analog)") {
    val probe = FixtureSource(sfDir).probe(spark, "lineitem")
    assert(probe.schema.fields.length === 11)
    assert(probe.count() === 0)
  }

  test("runSelected copies only the tables listed in the config (-s selFromYml)") {
    val dest = Files.createTempDirectory("graft_dest_sel").toString
    val cfg = SyncConfig(tables = Map(
      "nation" -> Seq.empty,
      "region" -> Seq.empty))
    val m = new Migrator(spark, FixtureSource(sfDir), dest, cfg)
    val results = m.runSelected()
    assert(results.map(_.table).sorted === Seq("nation", "region"))
    assert(results.forall(_.ok))
    val copied = new java.io.File(dest).listFiles().map(_.getName).toSet
    assert(copied === Set("nation.parquet", "region.parquet")) // nothing else
  }

  test("copyTable reports the observed row count without a read-back") {
    val dest = Files.createTempDirectory("graft_dest_obs").toString
    val r = new Migrator(spark, FixtureSource(sfDir), dest, SyncConfig())
      .copyTable("supplier")
    assert(r.ok)
    assert(r.rows === table("supplier").count())
  }

  test("failed table copies land in errorTableData.log (reference K7)") {
    val logDir = Files.createTempDirectory("graft_mig_logs").toString
    val logs = new graft.sinks.RunLogs(logDir)
    val dest = Files.createTempDirectory("graft_dest_err").toString
    val m = new Migrator(spark, FixtureSource(sfDir), dest, SyncConfig(), logs)
    val r = m.copyTable("no_such_table")
    assert(!r.ok)
    val lines = logs.lines("errorTableData")
    assert(lines.size === 1 && lines.head.startsWith("no_such_table -- ErrorInfo"))
  }

  test("rowDiff reports missing and mismatched rows, nothing else") {
    import spark.implicits._
    val src = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null: String, 40.0))
      .toDF("k", "v", "x")
    val dest = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, null: String, 40.0), (9L, "z", 0.0))
      .toDF("k", "v", "x")
    val got = Comparator.rowDiff(src, dest, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 matches; 4 matches null-safely; 2 differs; 3 missing; 9 extra
    assert(got === Map(2L -> "value_mismatch", 3L -> "missing_in_dest", 9L -> "missing_in_src"))
  }

  test("portableChecksum: order-insensitive, tamper-sensitive, null-vs-zero aware") {
    import spark.implicits._
    val base = Seq((1L, "alpha", 10.0), (2L, "beta", 0.0), (3L, null: String, 30.5))
      .toDF("k", "v", "x")
    val same = Comparator.portableChecksum(base).collect()(0)
    // row order must not matter
    val shuffled = Comparator.portableChecksum(base.orderBy(col("v").desc)).collect()(0)
    assert(same === shuffled)
    // a single changed character flips exactly that column's sum
    val tampered = Seq((1L, "alphA", 10.0), (2L, "beta", 0.0), (3L, null: String, 30.5))
      .toDF("k", "v", "x")
    val t = Comparator.portableChecksum(tampered).collect()(0)
    assert(t.getAs[java.math.BigDecimal]("v__sum") !== same.getAs[java.math.BigDecimal]("v__sum"))
    assert(t.getAs[java.math.BigDecimal]("k__sum") === same.getAs[java.math.BigDecimal]("k__sum"))
    // null and empty string both mix to 0 — the null COUNTER is what
    // tells them apart, so a null->'' rewrite is still caught
    val blank = Seq((1L, "alpha", 10.0), (2L, "beta", 0.0), (3L, "", 30.5))
      .toDF("k", "v", "x")
    val b = Comparator.portableChecksum(blank).collect()(0)
    assert(b.getAs[java.math.BigDecimal]("v__sum") === same.getAs[java.math.BigDecimal]("v__sum"))
    assert(b.getAs[Long]("v__nulls") === 0L && same.getAs[Long]("v__nulls") === 1L)
  }

  test("portableChecksum: decimal columns fingerprint exact unscaled units") {
    import spark.implicits._
    // -12.345 -> unscaled -12345; the mix of that integer is what the
    // destination engine recomputes (hand value: pmod twice)
    def mixOf(v: Long): Long = {
      val m = ((v % 2147483648L) + 2147483648L) % 2147483648L
      java.lang.Math.floorMod(m * 2654435761L, 4294967296L)
    }
    val df = Seq("-12.345", "0.001", null)
      .toDF("raw")
      .select(col("raw").cast("decimal(18,3)").as("d"))
    val r = Comparator.portableChecksum(df).collect()(0)
    assert(r.getAs[java.math.BigDecimal]("d__sum").longValueExact() ===
      mixOf(-12345L) + mixOf(1L), r.toString)
    assert(r.getAs[Long]("d__nulls") === 1L)
    // scale-0 decimals take the no-multiply path
    val d0 = Seq("7", "-3").toDF("raw").select(col("raw").cast("decimal(10,0)").as("d"))
    val r0 = Comparator.portableChecksum(d0).collect()(0)
    assert(r0.getAs[java.math.BigDecimal]("d__sum").longValueExact() ===
      mixOf(7L) + mixOf(-3L), r0.toString)
  }

  test("portableChecksum: extreme-precision decimals checksum exactly or fail loudly") {
    import spark.implicits._
    // decimal(38,10) types its x10^s multiply past 38 digits, so it
    // takes the congruence path: mix() only consumes v mod 2^31, and
    // the reduction happens BEFORE any wide arithmetic. Expected values
    // computed with driver-side BigInteger over the true unscaled units.
    def mixOfBig(v: java.math.BigInteger): Long = {
      val m = v.mod(java.math.BigInteger.valueOf(2147483648L)).longValueExact()
      java.lang.Math.floorMod(m * 2654435761L, 4294967296L)
    }
    // stress every branch: full 28-digit integer headroom, negatives,
    // sub-1e-7 magnitudes (whose BigDecimal string rendering is
    // scientific notation — a string-based path would mangle them),
    // an integer-valued row, and a null
    val vals = Seq(
      "1234567890123456789012345678.9876543210",
      "-9999999999999999999999999999.9999999999",
      "0.0000000001",
      "-0.0000000001",
      "42",
      null)
    val df = vals.toDF("raw").select(col("raw").cast("decimal(38,10)").as("d"))
    val r = Comparator.portableChecksum(df).collect()(0)
    val expected = vals.filter(_ != null).map { s =>
      mixOfBig(new java.math.BigDecimal(s).setScale(10).unscaledValue())
    }.sum
    assert(r.getAs[java.math.BigDecimal]("d__sum").longValueExact() === expected, r.toString)
    assert(r.getAs[Long]("d__nulls") === 1L)
    // decimal(38,18) is the tier's worst typing case: the xm−floor(xm)
    // subtraction would round the 17th/18th fraction digits away if the
    // modulus literal were typed decimal(20,0) — 0.000000000000000001
    // is the exact value that regression would zero out
    val vals18 = Seq(
      "0.000000000000000001",
      "-0.000000000000000001",
      "99999999999999999999.999999999999999999",
      "-1.000000000000000001",
      null)
    val df18 = vals18.toDF("raw").select(col("raw").cast("decimal(38,18)").as("d"))
    val r18 = Comparator.portableChecksum(df18).collect()(0)
    val expected18 = vals18.filter(_ != null).map { s =>
      mixOfBig(new java.math.BigDecimal(s).setScale(18).unscaledValue())
    }.sum
    assert(r18.getAs[java.math.BigDecimal]("d__sum").longValueExact() === expected18, r18.toString)
    // decimal(25,16) is the NARROW-integer-part tier-2 shape
    // (p+s+2 = 43 > 38 forces the congruence path, but p−s = 9 < 10):
    // pmod's positive representative of a NEGATIVE value needs 10
    // integer digits, so without the pre-pmod widening cast the row
    // would overflow pmod's own result type and silently null out of
    // the sum — exactly the failure mode this tier exists to prevent
    val vals25 = Seq(
      "-123456789.1234567890123456",
      "-0.0000000000000001",
      "999999999.9999999999999999",
      "-999999999.9999999999999999",
      null)
    val df25 = vals25.toDF("raw").select(col("raw").cast("decimal(25,16)").as("d"))
    val r25 = Comparator.portableChecksum(df25).collect()(0)
    val expected25 = vals25.filter(_ != null).map { s =>
      mixOfBig(new java.math.BigDecimal(s).setScale(16).unscaledValue())
    }.sum
    assert(r25.getAs[java.math.BigDecimal]("d__sum").longValueExact() === expected25, r25.toString)
    assert(r25.getAs[Long]("d__nulls") === 1L)
    // the genuinely un-normalizable shape refuses loudly instead of
    // letting overflowed rows vanish from the sum
    val wide = Seq("1.5").toDF("raw").select(col("raw").cast("decimal(38,20)").as("d"))
    val e = intercept[IllegalArgumentException] {
      Comparator.portableChecksum(wide)
    }
    assert(e.getMessage.contains("decimal(38,20)"))
  }

  test("portableChecksum: binary columns fold their hex bytes, empty pins to 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](0x00, 0x7f, -1)),
      (2L, Array.empty[Byte]),
      (3L, null: Array[Byte])
    ).toDF("k", "b")
    val r = Comparator.portableChecksum(df).collect()(0)
    // KR over hex "007FFF" (uppercase on both engines)
    val P = 1000000007L
    val kr = "007FFF".foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)
    def mixOf(v: Long): Long = {
      val m = ((v % 2147483648L) + 2147483648L) % 2147483648L
      java.lang.Math.floorMod(m * 2654435761L, 4294967296L)
    }
    // non-null contributions: mix(kr) for row 1, mix(0) = 0 for the
    // empty blob (same pin as the empty string)
    assert(r.getAs[java.math.BigDecimal]("b__sum").longValueExact() ===
      mixOf(kr) + mixOf(0L), r.toString)
    assert(r.getAs[Long]("b__nulls") === 1L)
  }
}
