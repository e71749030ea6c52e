package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  private def coverageByCol(path: String, cols: Seq[String]): Map[String, Double] =
    ZOrder.fileCoverage(spark, path, cols)
      .groupBy("column").agg(avg("coverage").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("zorderWrite: lossless — clustered copy has identical content") {
    val li = table("lineitem")
    val out = Files.createTempDirectory("graft_z").toString
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), out, numFiles = 8)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    assert(back.schema.fieldNames.toSeq === li.schema.fieldNames.toSeq, "no layout column leaks")
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty,
      "clustered copy must be a permutation of the source")
  }

  test("z-curve layout prunes on BOTH dimensions where a sort prunes on one") {
    // independent-ish dims on the fact table
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val files = 8
    val zdir = Files.createTempDirectory("graft_z2").toString
    val sdir = Files.createTempDirectory("graft_s2").toString
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), zdir, files)
    // baseline: classic single-column sorted write
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sdir)

    val zc = coverageByCol(zdir, Seq("l_orderkey", "l_partkey"))
    val sc = coverageByCol(sdir, Seq("l_orderkey", "l_partkey"))

    // the sorted write nails its own column and is blind on the other
    assert(sc("l_orderkey") < 0.3, s"sorted baseline sanity: $sc")
    assert(sc("l_partkey") > 0.8, s"sorted baseline sanity: $sc")
    // z-order: BOTH dimensions skip — each file covers a fraction of
    // each dim's span (2 dims x 8 files: expect ~sqrt(1/8) per dim)
    assert(zc("l_orderkey") < 0.6, s"z coverage: $zc")
    assert(zc("l_partkey") < 0.6, s"z coverage: $zc")
    // and the second dimension must beat the sorted layout decisively
    assert(zc("l_partkey") < sc("l_partkey") / 1.5, s"z=$zc sorted=$sc")
  }

  test("hilbert kernel: bijective on the full grid, consecutive indices step one axis by one") {
    import graft.functions.HilbertIndexExpression
    for ((dims, bits) <- Seq((2, 4), (3, 3), (4, 2), (2, 7))) {
      val side = 1 << bits
      val total = 1L << (bits * dims)
      val codes = (0L until total).map { h =>
        HilbertIndexExpression.axesOf(h, bits, dims).toSeq
      }
      // bijection: every grid cell visited exactly once
      assert(codes.toSet.size === total.toInt, s"d=$dims b=$bits not bijective")
      assert(codes.forall(_.forall(c => c >= 0 && c < side)))
      // the defining Hilbert property (Morton fails it): each step
      // moves ONE axis by exactly 1
      codes.sliding(2).foreach { case Seq(a, b) =>
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum === 1 && diffs.max === 1, s"jump $a -> $b")
      }
      // and axesOf inverts compute exactly
      (0L until total).foreach { h =>
        val x = HilbertIndexExpression.axesOf(h, bits, dims)
        val back = HilbertIndexExpression.compute(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(x.map(i => i: Any)), bits)
        assert(back === h, s"round-trip $h -> ${x.toSeq} -> $back")
      }
    }
    // bits = 31 (2 dims × 31 = 62 ≤ 63 — valid) must not Int-wrap the
    // range check: Int.MaxValue is a legal code there
    assert(HilbertIndexExpression.compute2(Int.MaxValue, 0, 31) >= 0L)
    // the zero-allocation 2-D scalar kernel IS the general mapping —
    // full-grid equality, so the write path may pick either freely
    for (bits <- Seq(3, 6); a <- 0 until (1 << bits); b <- 0 until (1 << bits)) {
      val g = HilbertIndexExpression.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](a, b)), bits)
      assert(HilbertIndexExpression.compute2(a, b, bits) === g, s"($a,$b) bits=$bits")
    }
  }

  test("hilbertWrite: lossless, prunes both dims, coverage not worse than morton") {
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val hdir = Files.createTempDirectory("graft_h").toString
    val zdir = Files.createTempDirectory("graft_hz").toString
    ZOrder.hilbertWrite(li, Seq("l_orderkey", "l_partkey"), hdir, numFiles = 16)
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), zdir, numFiles = 16)
    val back = spark.read.parquet(hdir)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    val hc = coverageByCol(hdir, Seq("l_orderkey", "l_partkey"))
    val zc = coverageByCol(zdir, Seq("l_orderkey", "l_partkey"))
    info(s"coverage hilbert=$hc morton=$zc")
    // both dims skip, and the no-teleport curve must not cover MORE of
    // the key space per file than Morton at the same file count
    assert(hc("l_orderkey") < 0.6 && hc("l_partkey") < 0.6, hc.toString)
    assert(hc.values.sum <= zc.values.sum * 1.05,
      s"hilbert $hc should not trail morton $zc")
  }

  test("hilbert lifecycle: append rides the stored curve, recluster keeps it") {
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val out = Files.createTempDirectory("graft_hlc").toString
    val base = li.filter(col("l_orderkey") % 10 =!= 0)
    val batch = li.filter(col("l_orderkey") % 10 === 0)
    ZOrder.hilbertWrite(base, Seq("l_orderkey", "l_partkey"), out, numFiles = 16)
    ZOrder.zorderAppend(batch, out, numFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty, "append must not duplicate or drop rows")
    // staged recluster preserves the hilbert curve from the contract
    ZOrder.reclusterZorder(spark, out, numFiles = 16)
    val after = spark.read.parquet(out)
    assert(after.count() === li.count())
    val meta = spark.read.parquet(s"$out/_zorder_meta")
    assert(meta.select("curve").distinct().collect().map(_.getString(0)).toSeq
      === Seq("hilbert"))
    // and the reclustered layout still skips on both dims
    val hc = coverageByCol(out, Seq("l_orderkey", "l_partkey"))
    assert(hc.values.forall(_ < 0.6), hc.toString)
  }

  test("lifecycle: append rides the stored contract, drift flags stale, recluster clears it") {
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val out = Files.createTempDirectory("graft_zlc").toString
    val base = li.filter(col("l_orderkey") % 10 =!= 0)
    val batch = li.filter(col("l_orderkey") % 10 === 0)
    // 16 files on 2 dims -> both dims' ideal per-file span is 0.25,
    // comfortably under the 0.5 staleness bound (see isStaleZorder doc)
    ZOrder.zorderWrite(base, Seq("l_orderkey", "l_partkey"), out, numFiles = 16)

    // same-distribution epoch append: O(batch) cost, layout stays healthy
    ZOrder.zorderAppend(batch, out, numFiles = 1)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count(), "append must lose nothing")
    assert(back.exceptAll(li).isEmpty, "append must be a pure permutation")
    assert(!ZOrder.isStaleZorder(spark, out), "healthy layout must not flag")

    // drifted epoch: keys far beyond the stored boundary range pile
    // into the top edge bucket -> edge_ppm spikes -> stale
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val drifted = batch.withColumn("l_orderkey", col("l_orderkey") + lit(maxKey * 10))
    ZOrder.zorderAppend(drifted, out, numFiles = 1)
    val stats = ZOrder.zorderStats(spark, out).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(stats("l_orderkey")._2 > 100000L,
      s"drifted keys must land in edge buckets: $stats")
    assert(ZOrder.isStaleZorder(spark, out), "drift must flag stale")

    // remediation: full recluster with fresh boundaries
    val current = spark.read.parquet(out)
    val re = Files.createTempDirectory("graft_zlc2").toString
    ZOrder.zorderWrite(current, Seq("l_orderkey", "l_partkey"), re, numFiles = 16)
    assert(!ZOrder.isStaleZorder(spark, re), "recluster must clear staleness")
    assert(spark.read.parquet(re).count() === current.count())
  }

  test("deleteWhereZorder: survivors stay clustered under the UNMOVED contract; epoch sinks collapse") {
    import spark.implicits._
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val out = Files.createTempDirectory("graft_zdel").toString + "/z"
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), out, numFiles = 16)
    val boundsBefore = spark.read.parquet(s"$out/_zorder_meta")
      .orderBy("idx").collect().map(_.toString).toSeq
    val expected = li.filter(!(col("l_orderkey") % 5 === 0))
    val (b, a) = ZOrder.deleteWhereZorder(spark, out,
      col("l_orderkey") % 5 === 0, numFiles = 16)
    assert(b === li.count() && a === expected.count())
    val back = spark.read.parquet(out)
    assert(back.count() === expected.count())
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty,
      "delete must keep exactly the survivors")
    // the layout contract did NOT move (a takedown is not drift repair)
    val boundsAfter = spark.read.parquet(s"$out/_zorder_meta")
      .orderBy("idx").collect().map(_.toString).toSeq
    assert(boundsAfter === boundsBefore)
    // ...and the survivors are still a clustered layout, not a scramble
    assert(!ZOrder.isStaleZorder(spark, out))
    // epoch-partitioned sink datasets collapse their epochs on delete
    // and stay valid for the resuming stream
    val edir = Files.createTempDirectory("graft_zdel_e").toString + "/corpus"
    val base = (0 until 200).map(i => (i.toLong, i.toLong * 3)).toDF("a", "b")
    ZOrder.zorderInit(base, Seq("a", "b"), edir)
    ZOrder.zorderAppendEpoch(base.filter(col("a") < 100), edir, 0L, 2)
    ZOrder.zorderAppendEpoch(base.filter(col("a") >= 100), edir, 1L, 2)
    val (eb, ea) = ZOrder.deleteWhereZorder(spark, edir, col("a") % 2 === 0, 2)
    assert(eb === 200L && ea === 100L)
    val eback = spark.read.parquet(edir)
    assert(eback.count() === 100L &&
      eback.select("batch").distinct().count() === 1L)
    ZOrder.zorderAppendEpoch(base.filter(col("a") < 10), edir, 7L, 1)
    assert(spark.read.parquet(edir).count() === 110L, "stream resumes after delete")
  }

  test("reclusterZorder: staged remediation clears drift-staleness without a loss window") {
    val li = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val out = Files.createTempDirectory("graft_zrc").toString + "/t"
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), out, numFiles = 16)
    // drift the layout stale, exactly as the lifecycle test does
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    ZOrder.zorderAppend(
      li.withColumn("l_orderkey", col("l_orderkey") + lit(maxKey * 10)),
      out, numFiles = 1)
    assert(ZOrder.isStaleZorder(spark, out), "drift must flag stale")
    val pre = spark.read.parquet(out).orderBy(
      "l_orderkey", "l_partkey", "l_quantity").collect().map(_.toString).toSeq
    ZOrder.reclusterZorder(spark, out, numFiles = 16)
    // fresh boundaries over the drifted data clear the staleness, the
    // content is a pure permutation, and no staging dirs linger
    assert(!ZOrder.isStaleZorder(spark, out), "recluster must clear staleness")
    val post = spark.read.parquet(out).orderBy(
      "l_orderkey", "l_partkey", "l_quantity").collect().map(_.toString).toSeq
    assert(post === pre)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(out + "__zorder_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(out + "__zorder_old")))
  }

  test("reclusterZorder: crash between the install renames — re-run recovers, zero loss") {
    val li = table("lineitem").select("l_orderkey", "l_partkey")
    val out = Files.createTempDirectory("graft_zrc_crash").toString + "/t"
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), out, numFiles = 16)
    val pre = spark.read.parquet(out).orderBy("l_orderkey", "l_partkey")
      .collect().map(_.toString).toSeq
    // stage the documented death state: dataset renamed aside, nothing
    // installed, a stale tmp lingering
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    val old = new org.apache.hadoop.fs.Path(q.getParent, q.getName + "__zorder_old")
    val tmp = new org.apache.hadoop.fs.Path(q.getParent, q.getName + "__zorder_tmp")
    assert(fs.rename(q, old))
    fs.mkdirs(tmp)
    // re-running the recluster must first recover the only copy (meta
    // contract included), then complete the rewrite
    ZOrder.reclusterZorder(spark, out, numFiles = 16)
    assert(!fs.exists(old) && !fs.exists(tmp))
    val post = spark.read.parquet(out).orderBy("l_orderkey", "l_partkey")
      .collect().map(_.toString).toSeq
    assert(post === pre)
    assert(!ZOrder.isStaleZorder(spark, out))
  }

  test("reclusterZorder: both copies present refuses; a failed rewrite leaves the layout live") {
    import spark.implicits._
    val li = table("lineitem").select("l_orderkey", "l_partkey")
    val out = Files.createTempDirectory("graft_zrc_both").toString + "/t"
    ZOrder.zorderWrite(li, Seq("l_orderkey", "l_partkey"), out, numFiles = 8)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    val old = new org.apache.hadoop.fs.Path(q.getParent, q.getName + "__zorder_old")
    Seq((1L, 2L)).toDF("l_orderkey", "l_partkey").write.parquet(old.toString)
    val pre = spark.read.parquet(out).count()
    // ambiguous state: refuse, touch neither copy
    val ex = intercept[java.io.IOException] {
      ZOrder.reclusterZorder(spark, out, numFiles = 8)
    }
    assert(ex.getMessage.contains("refusing"), ex.getMessage)
    assert(spark.read.parquet(out).count() === pre)
    assert(spark.read.parquet(old.toString).count() === 1L)
    fs.delete(old, true)
    // an exception INSIDE the staged rewrite (bad recluster column)
    // propagates before any rename — the live layout never moved
    val ex2 = intercept[Exception] {
      ZOrder.reclusterZorder(spark, out, numFiles = 8,
        cols = Seq("no_such_column"))
    }
    assert(spark.read.parquet(out).count() === pre,
      s"failed rewrite must leave the dataset live: $ex2")
    assert(!fs.exists(old))
  }

  test("edge_ppm excludes nulls — a nullable column is not permanently stale") {
    import spark.implicits._
    // b: uniform values with 30% nulls. Nulls code into bucket 0 for
    // layout, but counting them as edge rows kept the column above
    // edgePpmMax forever — a staleness no recluster could clear.
    val df = (1 to 2000).map { i =>
      (i.toLong, if (i % 10 < 3) Option.empty[Long] else Some(i.toLong))
    }.toDF("a", "b")
    val out = Files.createTempDirectory("graft_znull").toString
    ZOrder.zorderWrite(df, Seq("a", "b"), out, numFiles = 16)
    val stats = ZOrder.zorderStats(spark, out).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // a uniform layout keeps ~2/2^6 of NON-NULL values at the edges
    // (~31 250 ppm over all rows here minus the null share) — far
    // under the 100 000 default; with nulls counted b read ~331 000
    assert(stats("b") < 100000L, s"nulls must not count as drift: $stats")
    assert(!ZOrder.isStaleZorder(spark, out),
      "a 30%-null column must not flag a fresh layout stale")
  }

  test("fileCoverage: an all-null audited column fails with the column named") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zcovnull").toString
    Seq((1L, Option.empty[Long]), (2L, None)).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      ZOrder.fileCoverage(spark, dir, Seq("a", "b")).collect()
    }
    assert(ex.getMessage.contains("column b"), ex.getMessage)
  }

  test("an all-null clustered column fails with the column named") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Long]), (2L, None)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      ZOrder.quantileBounds(df, Seq("a", "b"), bits = 4)
    }
    assert(ex.getMessage.contains("column b"), ex.getMessage)
  }

  test("native bucket kernel equals the nested-when tree: duplicates, NaN, nulls, extremes") {
    import spark.implicits._
    // boundaries with duplicates (skewed approx_percentile output) and
    // values at/below/above every cut, plus NaN and null
    val bs = Seq(1.0, 3.0, 3.0, 3.0, 7.0, 10.0, 10.0)
    val vals: Seq[java.lang.Double] = Seq(
      -5.0, 0.999, 1.0, 2.0, 3.0, 3.0001, 6.0, 7.0, 9.0, 10.0, 11.0,
      Double.NaN, Double.MaxValue, Double.MinValue).map(Double.box) :+
      (null: java.lang.Double)
    val df = vals.toDF("v").select(col("v").cast("double").as("v"))
    val got = df.select(
      ZOrder.bucketCodeBuiltin(col("v"), bs).as("tree"),
      coalesce(graft.functions.BucketCodeExpression.bucketCode(col("v"), bs), lit(0))
        .as("kern"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), s"tree ${r.getInt(0)} vs kernel ${r.getInt(1)}")
    }
    // and across a random sweep against fresh random boundaries
    val rnd = new scala.util.Random(7)
    val bs2 = Seq.fill(63)(rnd.nextDouble() * 100).sorted
    val sweep = (1 to 2000).map(_ => rnd.nextDouble() * 120 - 10).toDF("v")
    val eq = sweep.select(
      (ZOrder.bucketCodeBuiltin(col("v"), bs2) ===
        coalesce(graft.functions.BucketCodeExpression.bucketCode(col("v"), bs2), lit(0)))
        .as("ok"))
      .collect()
    assert(eq.forall(_.getBoolean(0)))
  }

  test("clustered-write projections stay under HotSpot's 8000-byte JIT method ceiling") {
    // the regression this gate exists for: a single-use nested-when
    // bucket tree once pushed the Hilbert projection's whole-stage
    // method to 10842 bytecodes — past DontCompileHugeMethods, so the
    // hot loop ran INTERPRETED at 1.7x the write cost while Morton
    // escaped by a subexpression-elimination accident
    val li = table("lineitem").select("l_orderkey", "l_partkey")
    val cols = Seq("l_orderkey", "l_partkey")
    val bounds = ZOrder.quantileBounds(li, cols, 6)
    for ((tag, vc) <- Seq(
        "morton" -> ZOrder.zValueWith(cols, 6, bounds),
        "hilbert" -> ZOrder.hilbertValueWith(cols, 6, bounds))) {
      val cg = li.withColumn("__z", vc).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      val sizes = "maxMethodCodeSize:(\\d+)".r
        .findAllMatchIn(cg).map(_.group(1).toInt).toSeq
      assert(sizes.nonEmpty, s"$tag: no codegen subtree found")
      assert(sizes.max < 8000, s"$tag: maxMethodCodeSize ${sizes.max} breaches the JIT ceiling")
    }
  }

  test("zValue: interleaves rank buckets — null and skew land in low buckets, monotone per dim") {
    import spark.implicits._
    val df = (1 to 1024).map(i => (i.toLong, (1025 - i).toLong)).toDF("a", "b")
    val z = df.select(col("a"), col("b"),
      ZOrder.zValue(df, Seq("a", "b"), bits = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // width: 2 dims x 4 bits -> z < 2^8
    assert(z.forall(_._3 < 256L))
    // de-interleave each dimension's code back out of the z-value:
    // dim i's bit b sits at curve position b*2 + i
    def dim(zv: Long, i: Int): Long =
      (0 until 4).map(b => ((zv >> (b * 2 + i)) & 1L) << b).sum
    val byA = z.sortBy(_._1)
    val aCodes = byA.map(t => dim(t._3, 0))
    val bCodes = byA.map(t => dim(t._3, 1))
    // a ascending -> a's rank code non-decreasing and spanning all buckets;
    // b anti-correlated -> b's code non-increasing
    assert(aCodes.zip(aCodes.tail).forall { case (x, y) => x <= y }, "a code monotone")
    assert(bCodes.zip(bCodes.tail).forall { case (x, y) => x >= y }, "b code anti-monotone")
    assert(aCodes.distinct.length == 16 && bCodes.distinct.length == 16,
      "rank buckets must span the full 2^bits code range")
  }
}
