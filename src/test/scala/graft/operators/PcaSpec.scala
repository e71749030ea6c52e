package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def emb = table("embeddings")
  private val dim = 64

  /** Naive local covariance over the collected fixture — the oracle the
    * distributed moments aggregate must reproduce (sf0.001 = 500 rows,
    * so collecting here is a test-only convenience, not a pattern).
    */
  private lazy val localFit = {
    val rows = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    val mean = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      rows.map(r => r(i) * r(j)).sum / n - mean(i) * mean(j))
    (n, mean, cov)
  }

  test("fit: mean and covariance match the naive local computation") {
    val model = Pca.fit(emb, "embedding", dim, dim)
    val (n, mean, cov) = localFit
    assert(model.count == n)
    mean.indices.foreach(i =>
      assert(math.abs(model.mean(i) - mean(i)) < 1e-9,
        s"mean[$i]: ${model.mean(i)} vs ${mean(i)}"))
    // reconstruct covariance from the FULL eigensystem: V diag(λ) Vᵀ
    val rec = Array.tabulate(dim, dim)((i, j) =>
      (0 until dim).map(c =>
        model.components(c)(i) * model.eigenvalues(c) * model.components(c)(j)).sum)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(math.abs(rec(i)(j) - cov(i)(j)) < 1e-9,
        s"cov[$i][$j]: reconstructed ${rec(i)(j)} vs naive ${cov(i)(j)}")
    assert(math.abs(model.totalVariance - (0 until dim).map(i => cov(i)(i)).sum) < 1e-9)
  }

  test("fit: eigensystem is descending, orthonormal, and satisfies A v = λ v") {
    val model = Pca.fit(emb, "embedding", dim, 16)
    val (_, _, cov) = localFit
    model.eigenvalues.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b - 1e-12, s"eigenvalues not descending: $a < $b")
      case _ =>
    }
    assert(model.eigenvalues.forall(_ >= 0.0))
    for (a <- 0 until 16; b <- 0 until 16) {
      val d = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"components $a . $b = $d, want $want")
    }
    for (c <- 0 until 16) {
      val v = model.components(c)
      val av = Array.tabulate(dim)(i => v.indices.map(j => cov(i)(j) * v(j)).sum)
      val lv = v.map(_ * model.eigenvalues(c))
      av.indices.foreach(i =>
        assert(math.abs(av(i) - lv(i)) < 1e-8,
          s"component $c residual at dim $i: ${av(i)} vs ${lv(i)}"))
    }
  }

  test("fit: top components capture more variance than trailing ones; ratio sane") {
    val model = Pca.fit(emb, "embedding", dim, dim)
    val ev = model.eigenvalues
    assert(math.abs(ev.sum - model.totalVariance) < 1e-9,
      "full eigensystem must account for the whole trace")
    val top16 = ev.take(16).sum / model.totalVariance
    assert(top16 > 16.0 / 64.0,
      s"top-16 share $top16 should beat the uniform 0.25 floor")
    val m16 = Pca.fit(emb, "embedding", dim, 16)
    assert(math.abs(m16.explainedVariance - top16) < 1e-12)
  }

  test("project: exact copies project to identical vectors; projection matches driver math") {
    val model = Pca.fit(emb, "embedding", dim, 8)
    val union = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.select(col("vec_id") + 1000000, col("embedding")).limit(0))
    val p = Pca.project(union, "embedding", model)
      .select(col("vec_id"), col("pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // driver-side replay of one row
    val x = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val want = model.components.map(w =>
      w.zip(x).map { case (wi, xi) => wi * xi }.sum -
        w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum)
    p(7L).zip(want).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-9, s"projection mismatch: $got vs $exp") }
    // identical input rows produce bitwise-identical projections
    val dup = Pca.project(
      emb.filter(col("vec_id") === 7).select(col("embedding"))
        .unionAll(emb.filter(col("vec_id") === 7).select(col("embedding"))),
      "embedding", model).select(col("pca")).collect()
    assert(dup(0).getSeq[Double](0) == dup(1).getSeq[Double](0))
  }

  test("pcaTopK: planted copies recover their originals at rank 1") {
    val queries = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000).as("query_id"), col("embedding"))
    val hits = Pca.pcaTopK(queries, emb.select(col("vec_id"), col("embedding")),
        "query_id", "embedding", "vec_id", "embedding",
        dim = dim, nComponents = 16, k = 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.size == 20)
    hits.foreach { case (q, n) => assert(n == q - 1000000, s"query $q hit $n") }
  }

  test("model persistence: write/read roundtrip is exact; projection from the read model matches") {
    val model = Pca.fit(emb, "embedding", dim, 5)
    Pca.writePcaModel(spark, model, "pca_spec_model")
    val back = Pca.readPcaModel(spark, "pca_spec_model")
    assert(back == model)
    val a = Pca.project(emb.limit(3), "embedding", model).select(col("pca")).collect()
    val b = Pca.project(emb.limit(3), "embedding", back).select(col("pca")).collect()
    assert(a.map(_.getSeq[Double](0)).toSeq == b.map(_.getSeq[Double](0)).toSeq)
  }

  test("fit guards: k range, ragged rows, dim cap") {
    intercept[IllegalArgumentException](Pca.fit(emb, "embedding", dim, 0))
    intercept[IllegalArgumentException](Pca.fit(emb, "embedding", dim, dim + 1))
    val ragged = emb.select(slice(col("embedding"), 1, 32).as("embedding"))
    val ex = intercept[Exception](Pca.fit(ragged, "embedding", dim, 2))
    assert(ex.getMessage != null)
    // a null ELEMENT must fail loudly, not silently read as 0.0
    val nullElem = emb.select(concat(
      slice(col("embedding").cast("array<double>"), 1, dim - 1),
      array(lit(null).cast("double"))).as("embedding"))
    val ex2 = intercept[Exception](Pca.fit(nullElem, "embedding", dim, 2))
    assert(ex2.getMessage != null && ex2.getMessage.contains("null element"),
      s"wanted the null-element guard, got: ${ex2.getMessage}")
  }

  test("whitened projection has unit variance per retained direction; whiten=false is unchanged") {
    val model = Pca.fit(emb, "embedding", dim, 8)
    val w = Pca.project(emb, "embedding", model, "pca", whiten = true)
      .select(col("pca")).collect().map(_.getSeq[Double](0))
    val n = w.length
    for (c <- 0 until 8) {
      val xs = w.map(_(c))
      val mean = xs.sum / n
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varc - 1.0) < 1e-6, s"whitened var[$c] = $varc")
      assert(math.abs(mean) < 1e-6, s"whitened mean[$c] = $mean")
    }
    // default path is bit-identical to the pre-whitening contract
    val a = Pca.project(emb.limit(5), "embedding", model)
      .select(col("pca")).collect().map(_.getSeq[Double](0)).toSeq
    val b = Pca.project(emb.limit(5), "embedding", model, "pca", whiten = false)
      .select(col("pca")).collect().map(_.getSeq[Double](0)).toSeq
    assert(a == b)
  }

  test("moments lifecycle: two appended halves refit the whole-corpus model") {
    spark.sql("DROP TABLE IF EXISTS pca_moments_spec")
    Pca.appendMoments(emb.filter(col("vec_id") % 2 === 0), "embedding",
      dim, batchId = 0L, tableName = "pca_moments_spec")
    Pca.appendMoments(emb.filter(col("vec_id") % 2 === 1), "embedding",
      dim, batchId = 1L, tableName = "pca_moments_spec")
    val fromMoments = Pca.fitFromMoments(spark, "pca_moments_spec", 8)
    val whole = Pca.fit(emb, "embedding", dim, 8)
    assert(fromMoments.count == whole.count)
    fromMoments.mean.zip(whole.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"mean drift: $a vs $b") }
    fromMoments.eigenvalues.zip(whole.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"eigenvalue drift: $a vs $b") }
    for (c <- 0 until 8) {
      val d = fromMoments.components(c).zip(whole.components(c))
        .map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(d) - 1.0) < 1e-6,
        s"component $c direction drift: |dot| = ${math.abs(d)}")
    }
  }

  test("moments lifecycle: a replayed epoch append never double-counts") {
    spark.sql("DROP TABLE IF EXISTS pca_moments_replay")
    Pca.appendMoments(emb.filter(col("vec_id") % 2 === 0), "embedding",
      dim, batchId = 0L, tableName = "pca_moments_replay")
    Pca.appendMoments(emb.filter(col("vec_id") % 2 === 1), "embedding",
      dim, batchId = 1L, tableName = "pca_moments_replay")
    val before = Pca.fitFromMoments(spark, "pca_moments_replay", 4)
    // the crash-retry: same batch id, same data, appended again
    Pca.appendMoments(emb.filter(col("vec_id") % 2 === 1), "embedding",
      dim, batchId = 1L, tableName = "pca_moments_replay")
    val after = Pca.fitFromMoments(spark, "pca_moments_replay", 4)
    assert(after == before, "replayed append changed the model")
    val stats = Pca.momentsStats(spark, "pca_moments_replay").head()
    assert(stats.getAs[Long]("n_batches") == 2L)
    assert(stats.getAs[Long]("n_rows") == emb.count())
    assert(stats.getAs[Int]("dim") == dim)
  }

  test("moments lifecycle: mixed dims fail loudly") {
    spark.sql("DROP TABLE IF EXISTS pca_moments_mixed")
    Pca.appendMoments(emb.limit(10), "embedding",
      dim, batchId = 0L, tableName = "pca_moments_mixed")
    Pca.appendMoments(
      emb.limit(10).select(slice(col("embedding"), 1, 32).as("embedding")),
      "embedding", 32, batchId = 1L, tableName = "pca_moments_mixed")
    val ex = intercept[IllegalArgumentException](
      Pca.fitFromMoments(spark, "pca_moments_mixed", 2))
    assert(ex.getMessage.contains("mixes dims"))
  }

  test("pcaRecallProbe: deterministic, and a 16-component squeeze preserves most full-space neighbors") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val r16 = Pca.pcaRecallProbe(base, "vec_id", "embedding",
      dim, nComponents = 16, nQueries = 16, k = 5)
    assert(r16 == Pca.pcaRecallProbe(base, "vec_id", "embedding",
      dim, nComponents = 16, nQueries = 16, k = 5), "probe must be deterministic")
    assert(r16 >= 300000L && r16 <= 1000000L, s"16-comp recall $r16 ppm out of band")
    // a 2-component squeeze must lose more neighbors than 16 keep
    val r2 = Pca.pcaRecallProbe(base, "vec_id", "embedding",
      dim, nComponents = 2, nQueries = 16, k = 5)
    assert(r2 < r16, s"2-comp recall $r2 should trail 16-comp $r16")
  }

  test("jacobi: known 2x2 eigensystem") {
    val (ev, v) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = ev.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for λ=3 is (1,1)/√2 up to sign
    val idx = if (ev(0) > ev(1)) 0 else 1
    assert(math.abs(math.abs(v(0)(idx)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0)(idx) - v(1)(idx)) < 1e-12)
  }
}
