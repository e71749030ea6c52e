package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvSketchExpression

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("kmv: exact below k, bounded state at k, estimate within theory bound above k") {
    // 40_000 ids through the same Knuth mix the operator uses — known
    // true cardinality, deterministic
    val n = 40000
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("grp", "id")
      .select(col("grp"), Corpus.portableHash(col("id")).as("mh"))
    val k = 256
    val sk = df.groupBy("grp")
      .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sketch"))
      .select(Sketches.kmvEstimate(col("sketch"), k).as("est"),
        size(col("sketch")).as("sz"))
      .head()
    assert(sk.getInt(1) == k, "sketch must cap at k values")
    val est = sk.getLong(0).toDouble
    // KMV standard error is ~1/sqrt(k-2); allow 4 sigma
    val tol = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) / n < tol,
      s"estimate $est vs true $n outside ${tol * 100}%")

    // below k: exact
    val small = (1 to 100).map(i => ("g", i.toLong)).toDF("grp", "id")
      .select(col("grp"), Corpus.portableHash(col("id")).as("mh"))
    val exact = small.groupBy("grp")
      .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sketch"))
      .select(Sketches.kmvEstimate(col("sketch"), k).as("est")).head().getLong(0)
    assert(exact == 100L, "below k the sketch IS the distinct set")
  }

  test("kmv: duplicate values collapse (sketch dedups, unlike a top-k queue)") {
    val k = 8
    val dup = Seq.fill(1000)(7L) ++ Seq(1L, 2L, 3L)
    val est = dup.map(("g", _)).toDF("grp", "mh")
      .groupBy("grp").agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sketch"))
      .select(Sketches.kmvEstimate(col("sketch"), k).as("est")).head().getLong(0)
    assert(est == 4L, s"4 distinct values must estimate exactly 4, got $est")
  }

  test("kmv merge identity: merged half-sketches equal the whole-corpus sketch") {
    val k = 32
    val rows = (1 to 5000).map(i => (i % 3, (i * 31 + 7).toLong))
    val df = rows.toDF("grp", "id")
      .select(col("grp"), Corpus.portableHash(col("id")).as("mh"))
    def sketchOf(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp")
      .agg(KmvSketchExpression.kmvSketch(col("mh"), k).as("sketch"))
    val whole = sketchOf(df).collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val h0 = sketchOf(df.filter(pmod(col("mh"), lit(2)) === 0))
    val h1 = sketchOf(df.filter(pmod(col("mh"), lit(2)) === 1))
    val merged = h0.withColumnRenamed("sketch", "s0")
      .join(h1.withColumnRenamed("sketch", "s1"), Seq("grp"), "full_outer")
      .select(col("grp"), Sketches.kmvMerge(
        coalesce(col("s0"), array().cast("array<bigint>")),
        coalesce(col("s1"), array().cast("array<bigint>")), k).as("sketch"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(merged == whole,
      "sketch(A) ⊎ sketch(B) must equal sketch(A ∪ B) exactly")
  }

  test("kmvDistinctShingles: single shuffle, bounded partial aggregation") {
    val out = Sketches.kmvDistinctShingles(table("documents"), "lang", "text", n = 3, k = 64)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_kmv_sketch"),
      "map-side partial must carry the bounded buffer:\n" + plan)
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).length == 1,
      "KMV must shuffle exactly once:\n" + plan)
  }

  test("sampledTokenQuantiles: rank selection matches a driver-side recompute") {
    val out = Sketches.sampledTokenQuantiles(
      table("documents"), "lang", "doc_id", "text", rate = 4, tenths = Seq(5, 9))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // recompute the same lottery + rank selection in plain Scala
    val docs = table("documents")
      .select(col("lang"), col("doc_id"), col("text")).collect()
    val sampled = docs.filter { r =>
      val id = r.getLong(1)
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      h % 4 == 0
    }
    val byLang = sampled.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val toks = rows.map(r =>
        (r.getString(2).split(" ", -1).length.toLong, r.getLong(1)))
        .sortBy(identity).map(_._1)
      val n = toks.length
      def sel(q: Int) = toks(((n - 1) * q / 10 + 1) - 1)
      assert(out(lang) == ((sel(5), sel(9), n.toLong)),
        s"quantile mismatch for $lang")
    }
  }

  // --- Misra–Gries heavy hitters ---

  /** Skewed synthetic term stream with known exact counts: term "h{i}"
    * appears 2000/2^i times (planted hitters), plus a long tail of
    * 400 singletons. N = 3900 + 400.
    */
  private def mgStream: (Seq[String], Map[String, Long]) = {
    val hitters = (0 to 4).flatMap(i => Seq.fill(2000 / (1 << i))(s"h$i"))
    val tail = (1 to 400).map(i => s"t$i")
    val terms = hitters ++ tail
    (terms, terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong })
  }

  test("mg sketch: exact regime (m >= distinct) yields err=0 and true counts") {
    val (terms, truth) = mgStream
    val out = Sketches.heavyHitters(
      terms.map(("g", _)).toDF("grp", "term"), "grp", "term", m = 1024)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
    assert(out.length == truth.size)
    out.foreach { case (t, (est, err)) =>
      assert(err == 0L, s"exact regime must not decrement, term $t err=$err")
      assert(est == truth(t), s"term $t: est=$est true=${truth(t)}")
    }
  }

  test("mg sketch: certificate est <= true <= est+err holds under any partitioning") {
    val (terms, truth) = mgStream
    val n = terms.size.toLong
    val m = 16
    for (parts <- Seq(1, 13)) {
      val out = Sketches.heavyHitters(
        terms.map(("g", _)).toDF("grp", "term").repartition(parts),
        "grp", "term", m)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      assert(out.nonEmpty && out.length <= m)
      val err = out.head._3
      assert(err <= n / (m + 1),
        s"error budget $err exceeds N/(m+1) = ${n / (m + 1)}")
      out.foreach { case (t, est, e) =>
        assert(e == err, "err is a group-level scalar")
        val truef = truth(t)
        assert(est <= truef && truef <= est + err,
          s"term $t: certificate violated (est=$est err=$err true=$truef)")
      }
      // recovery guarantee: any term with true frequency > err survives
      val present = out.map(_._1).toSet
      truth.foreach { case (t, f) =>
        if (f > err) assert(present.contains(t),
          s"term $t (freq $f > err $err) must be present at parts=$parts")
      }
    }
  }

  test("kmv pairwise jaccard: identical groups read 1e6 ppm, disjoint groups 0") {
    // two groups with identical text, one disjoint; below k the sketch
    // is the distinct set and the estimator is exact
    val docs = Seq(
      ("a", "alpha beta gamma delta epsilon zeta"),
      ("b", "alpha beta gamma delta epsilon zeta"),
      ("c", "one two three four five six")
    ).toDF("grp", "text")
    val out = Sketches.kmvPairwiseJaccard(docs, "grp", "text", n = 3, k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out(("a", "b")) == 1000000L, s"identical sets must read 1e6: $out")
    assert(out(("a", "c")) == 0L && out(("b", "c")) == 0L,
      s"disjoint sets must read 0: $out")
  }

  test("mg sketch: non-string terms fail analysis; negative weights are rejected at run time") {
    import graft.functions.MgSketchExpression
    val nums = Seq(1L, 2L).toDF("v")
    // a long term column must be an ANALYSIS error, not a per-task
    // ClassCastException
    val ex = intercept[Exception] {
      nums.agg(MgSketchExpression.mgSketch(col("v"), 8)).collect()
    }
    assert(ex.getMessage.contains("STRING"), ex.getMessage)
    // a negative weight silently voids est <= true <= est + err
    val neg = Seq(("a", -1L)).toDF("term", "w")
    val ex2 = intercept[Exception] {
      neg.agg(MgSketchExpression.mgSketchWeighted(col("term"), col("w"), 8)).collect()
    }
    assert(ex2.getMessage.contains("non-negative") ||
      Option(ex2.getCause).exists(_.getMessage.contains("non-negative")), ex2.toString)
  }

  test("mg sketch: weighted updates count weight mass, not rows") {
    import graft.functions.MgSketchExpression
    val df = Seq(("a", 10L), ("b", 3L), ("a", 5L), ("c", 1L))
      .toDF("term", "w")
    val out = df.agg(
      MgSketchExpression.mgSketchWeighted(col("term"), col("w"), m = 8).as("sk"))
      .select(explode(col("sk.items")).as("it"))
      .select(col("it.term"), col("it.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 15L, "b" -> 3L, "c" -> 1L))
  }

  test("count-min: one-sided certificate true <= est for every queried term") {
    val docs = table("documents")
    val probes = Seq("spark", "hash", "vector", "merge", "window", "zzqx")
    val est = Sketches.cmTokenCounts(docs, "lang", "text", probes, w = 16, d = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = docs
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t").isin(probes: _*))
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.nonEmpty)
    // every (lang, probe) estimate dominates its true count; the absent
    // probe's floor is whatever collided, never negative
    est.foreach { case (k, e) =>
      assert(e >= exact.getOrElse(k, 0L), s"$k: est $e < true ${exact.get(k)}")
    }
    // at least one probe must be present somewhere or the cert is vacuous
    assert(exact.nonEmpty)
  }

  test("count-min: matrix is partition-invariant and merges by element-wise add") {
    import graft.functions.{CmSketchExpression, KrHashExpression}
    val docs = table("documents")
    def matrix(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .select(KrHashExpression.krHash(col("t")).as("hv"))
      .agg(CmSketchExpression.cmSketch(col("hv"), lit(1L), 16, 4).as("sk"))
      .collect()(0).getSeq[Long](0)
    val whole = matrix(docs)
    assert(whole.length == 64 && whole.sum > 0)
    assert(matrix(docs.repartition(7)) == whole, "order/partitioning must not matter")
    // half-sketches add to the whole — the tree-reduce identity
    val a = matrix(docs.filter(col("doc_id") % 2 === 0))
    val b = matrix(docs.filter(col("doc_id") % 2 === 1))
    assert(a.zip(b).map { case (x, y) => x + y } == whole)
  }

  test("count-min: token-free groups emit the zero matrix; raw 64-bit hashes probe update's cells") {
    import graft.functions.CmSketchExpression
    val df = Seq((1L, "en", "alpha beta"), (2L, "xx", "   "))
      .toDF("doc_id", "lang", "text")
    val out = Sketches.cmTokenCounts(df, "lang", "text", Seq("alpha", "zz"),
      w = 8, d = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the oracle grids over every group, so a group whose documents are
    // all token-free must answer est=0 rows, not silently vanish
    assert(out.keySet.map(_._1) == Set("en", "xx"), out.toString)
    assert(out(("xx", "alpha")) == 0L && out(("xx", "zz")) == 0L)
    assert(out(("en", "alpha")) >= 1L)
    // estimate must normalize a raw hash into [0, P) exactly as update
    // does — an overflowing affine multiply would read DIFFERENT cells
    // and could answer below the true count
    val big = Seq(9100000000000000000L, -123456789L).toDF("hv")
    val est = big
      .agg(CmSketchExpression.cmSketch(col("hv"), lit(1L), 8, 3).as("sk"))
      .select(
        Sketches.cmEstimate(col("sk"), lit(9100000000000000000L), 8, 3).as("a"),
        Sketches.cmEstimate(col("sk"), lit(-123456789L), 8, 3).as("b"))
      .head()
    assert(est.getLong(0) >= 1L && est.getLong(1) >= 1L, est.toString)
  }

  test("count-min: negative weights rejected, zero weights contribute nothing") {
    import graft.functions.CmSketchExpression
    val neg = Seq((1L, -1L)).toDF("hv", "w")
    val ex = intercept[Exception] {
      neg.agg(CmSketchExpression.cmSketch(col("hv"), col("w"), 16, 2)).collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-negative")), ex.toString)
    val z = Seq((5L, 0L), (5L, 3L)).toDF("hv", "w")
      .agg(CmSketchExpression.cmSketch(col("hv"), col("w"), 16, 2).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(z.sum == 3L * 2, "only the weighted mass lands, once per row of depth")
  }

  test("mg sketch: zero-weight rows neither occupy a slot nor emit est=0 rows") {
    import graft.functions.MgSketchExpression
    // m comfortably above the distinct count: no trim ever fires, so a
    // zero-weight term that slipped into the counter map would survive
    // to the output as a spurious (term, est=0) row
    val df = Seq(("a", 5L), ("z", 0L), ("b", 3L), ("z", 0L))
      .toDF("term", "w")
    val out = df.agg(
      MgSketchExpression.mgSketchWeighted(col("term"), col("w"), m = 8).as("sk"))
      .select(col("sk.err").as("err"), explode(col("sk.items")).as("it"))
      .select(col("err"), col("it.term"), col("it.est"))
      .collect()
    assert(out.forall(_.getLong(0) == 0L), "exact regime: err must stay 0")
    val items = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(items == Map("a" -> 5L, "b" -> 3L), items.toString)
  }

  test("kmv join-key overlap: exact below k, within tolerance above, disjoint reads zero") {
    def keys(r: Range) = r.map(i => ("x", i.toLong)).toDF("g", "k")
    // exact regime: both sides under k distinct — overlap is exact
    val ex = Sketches.kmvKeyOverlap(keys(1 to 50), "k", keys(26 to 75), "k", k = 256).head()
    assert(ex.getAs[Long]("est_distinct_a") === 50L)
    assert(ex.getAs[Long]("est_distinct_b") === 50L)
    assert(ex.getAs[Long]("est_overlap") === 25L)
    // approximate regime: 4-sigma KMV tolerance on sides and overlap
    val ap = Sketches.kmvKeyOverlap(
      keys(1 to 40000), "k", keys(20001 to 60000), "k", k = 256).head()
    val tol = 4.0 / math.sqrt(256 - 2.0)
    assert(math.abs(ap.getAs[Long]("est_distinct_a") - 40000.0) / 40000 < tol, ap.toString)
    assert(math.abs(ap.getAs[Long]("est_overlap") - 20000.0) / 20000 < 2 * tol, ap.toString)
    // disjoint key spaces: the screen must answer "this join matches
    // nothing" with a hard zero, not a small estimate
    val dj = Sketches.kmvKeyOverlap(
      keys(1 to 10000), "k", keys(50001 to 60000), "k", k = 256).head()
    assert(dj.getAs[Long]("matches") === 0L && dj.getAs[Long]("est_overlap") === 0L)
    // STRING join keys hash through the KR fold — a bare cast-to-long
    // would null every key and report zero overlap for a full match
    def urls(r: Range) = r.map(i => ("x", s"https://host/$i")).toDF("g", "k")
    val su = Sketches.kmvKeyOverlap(urls(1 to 50), "k", urls(26 to 75), "k", k = 256).head()
    assert(su.getAs[Long]("est_distinct_a") === 50L)
    assert(su.getAs[Long]("est_overlap") === 25L, su.toString)
  }

  // --- mergeable quantile sketch -------------------------------------

  /** Reported deciles + err from sketchQuantiles over (g, v) pairs. */
  private def qsDeciles(df: org.apache.spark.sql.DataFrame, c: Int): (Map[Int, Long], Long) = {
    val r = Sketches.sketchQuantiles(df, "g", "v", c, tenths = Seq(1, 5, 9)).head()
    (Map(1 -> r.getAs[Long]("p10"), 5 -> r.getAs[Long]("p50"), 9 -> r.getAs[Long]("p90")),
      r.getAs[Long]("err"))
  }

  test("quantile sketch: exact regime — err 0, deciles equal plain rank selection, partition-invariant") {
    val vals = (1L to 1000L).map(v => ("g", v))
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals, parts)).toDF("g", "v")
      val (dec, err) = qsDeciles(df, c = 2048)
      assert(err === 0L, s"no compaction below c: err $err")
      // integral index over 1..1000: idx = 999*q/10 + 1
      assert(dec === Map(1 -> 100L, 5 -> 500L, 9 -> 900L), dec.toString)
    }
  }

  test("quantile sketch: compaction certificate holds under any partitioning, err is budgeted") {
    // deterministic skew: squares compress the low end, stretch the top
    val n = 20000
    val vals = (1L to n.toLong).map(v => ("g", v * v))
    val sortedVals = vals.map(_._2).sorted
    for (parts <- Seq(1, 8, 32)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals, parts)).toDF("g", "v")
      val c = 64
      val (dec, err) = qsDeciles(df, c)
      assert(err > 0L, "deep compaction must spend error budget")
      // the carried budget must stay within the MRL bound O(n·log(n/c)/c)
      val bound = (2.0 * n * (math.log(n.toDouble / c) / math.log(2)) / c).toLong
      assert(err <= bound, s"err $err exceeds theory bound $bound")
      dec.foreach { case (q, v) =>
        val idx = (n - 1).toLong * q / 10 + 1
        val less = sortedVals.count(_ < v).toLong
        val leq = sortedVals.count(_ <= v).toLong
        // certificate: trueLess − err < idx ≤ trueLeq + err
        assert(less - err < idx && idx <= leq + err,
          s"parts=$parts decile $q: value $v rank ($less, $leq] vs idx $idx ± $err")
      }
    }
  }

  test("quantile sketch: growing capacity shrinks the certificate, state stays bounded") {
    val n = 20000
    val vals = (1L to n.toLong).map(v => ("g", v))
    val df = vals.toDF("g", "v")
    val errs = Seq(32, 128, 512).map { c => qsDeciles(df, c)._2 }
    assert(errs(0) > errs(1) && errs(1) > errs(2), s"err must fall with c: $errs")
    // surviving items are O(c · levels), never O(n)
    val items = df.groupBy("g")
      .agg(graft.functions.QuantileSketchExpression
        .quantileSketch(col("v"), 64).as("sk"))
      .select(size(col("sk.items"))).head().getInt(0)
    val levels = (math.log(n / 64.0) / math.log(2)).toInt + 2
    assert(items <= 64 * levels, s"state $items exceeds c·levels bound ${64 * levels}")
  }

  test("quantile sketch: an all-null group stays in the output with null deciles and n = 0") {
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("b", None), ("b", None))
      .toDF("g", "v")
    val rows = Sketches.sketchQuantiles(df, "g", "v", c = 64, tenths = Seq(5))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("a", "b"), "the null-only group must not vanish")
    assert(rows("a").getAs[Long]("p50") === 10L && rows("a").getAs[Long]("n") === 2L)
    assert(rows("b").isNullAt(rows("b").fieldIndex("p50")))
    assert(rows("b").getAs[Long]("n") === 0L)
  }

  test("quantile sketch buffer: mass exact and levels bounded under 200 adversarial merge trees") {
    // the raw buffer, no Spark: random data merged in random tree
    // orders must conserve mass EXACTLY (the n readout the operators
    // trust) and never let a level exceed 2c (the bounded-state claim)
    import graft.functions.QuantileSketchExpression.QsBuffer
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val c = Seq(2, 4, 8, 16)(rnd.nextInt(4))
      val n = 1 + rnd.nextInt(5000)
      val parts = 1 + rnd.nextInt(8)
      val bufs = Array.fill(parts)(new QsBuffer)
      for (_ <- 1 to n) bufs(rnd.nextInt(parts)).offer(rnd.nextLong(1000), c)
      val live = bufs.toBuffer
      while (live.size > 1) {
        val i = rnd.nextInt(live.size - 1) + 1
        live(0).absorb(live(i), c)
        live.remove(i)
      }
      val b = live(0)
      assert(b.allItems.map(_._2).sum === n.toLong,
        s"trial $trial (c=$c, parts=$parts): mass lost")
      val sizes = b.levels.map(_.length).toSeq
      assert(sizes.forall(_ <= 2 * c), s"trial $trial: level sizes $sizes vs c=$c")
      assert(b.err >= 0L)
    }
  }

  test("quantile sketch: duplicates carry weight mass; odd stragglers are never dropped") {
    // 10k copies of one value plus a tail — mass conservation means the
    // heavy value still dominates every low decile after compaction
    val vals = Seq.fill(10000)(("g", 5L)) ++ (1L to 100L).map(v => ("g", 1000L + v))
    val df = vals.toDF("g", "v")
    val r = Sketches.sketchQuantiles(df, "g", "v", c = 64, tenths = Seq(1, 5, 9)).head()
    // total mass is conserved exactly through halvings (doubled weights
    // + stragglers), so n reads the true row count
    assert(r.getAs[Long]("n") === 10100L, r.toString)
    assert(r.getAs[Long]("p10") === 5L && r.getAs[Long]("p50") === 5L, r.toString)
  }
}
