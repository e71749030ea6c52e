package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSpec extends SparkSpec {

  private def emb = table("embeddings")

  private def tiny = {
    import spark.implicits._
    // hand-built geometry vs query (1,0,0,0): 1 is the relevance winner
    // (rel .90); 2 is a near-copy of 1 (rel .85, cos(2,1) ≈ .99 — the
    // redundant result MMR exists to demote); 3 is relevant-but-distant
    // (rel .70, cos(3,1) ≈ .41); 4 is near-orthogonal filler (rel .10).
    // At λ = 0.65 the greedy order is 1, 3, 2, 4 — NOT the relevance
    // order 1, 2, 3, 4 (margins ≥ 0.1 in every round, replayed in the
    // scaladoc arithmetic by hand)
    Seq(
      (1L, Seq(0.9, 0.43589, 0.0, 0.0)),
      (2L, Seq(0.85, 0.516, 0.107, 0.0)),
      (3L, Seq(0.7, -0.51, 0.5, 0.0)),
      (4L, Seq(0.1, 0.0, 0.0, 0.995))
    ).toDF("cand_id", "vec")
  }

  private def tinyQuery = {
    import spark.implicits._
    Seq((100L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "vec")
  }

  test("mmr: rank 1 is the plain relevance argmax") {
    val out = Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 1, lambdaPpm = 500000L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("neighbor_id") == 1L)
    assert(out(0).getAs[Int]("rank") == 1)
  }

  test("mmr: diversity penalty demotes the near-duplicate of an earlier pick") {
    val out = Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 4, lambdaPpm = 650000L)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    // plain top-4 by relevance would be (1, 2, 3, 4); MMR at λ=0.65
    // demotes 2 (cos(2,1) ≈ 0.99 penalty) below 3
    assert(out == Seq(1L, 3L, 2L, 4L), s"got $out")
  }

  test("mmr: λ=1 reduces to relevance-ordered top-k") {
    val out = Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 4, lambdaPpm = 1000000L)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val brute = Similarity.bruteForceTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 4)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(out == brute, s"λ=1 MMR $out vs brute $brute")
  }

  test("mmr: k beyond the corpus stops early with every candidate ranked once") {
    val out = Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 10, lambdaPpm = 700000L)
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("mmr: a candidate sharing the query id is excluded") {
    import spark.implicits._
    val q = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("query_id", "vec")
    val out = Similarity.mmrTopK(q, tiny,
      "query_id", "vec", "cand_id", "vec", k = 4, lambdaPpm = 700000L)
      .collect()
    assert(out.length == 3)
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(1L))
  }

  test("mmr: deterministic across invocations, fixture-scale, multiple queries") {
    def run() = Similarity.mmrTopK(
      emb.filter(col("vec_id") < 3).select(
        (col("vec_id") + 1000000).as("vec_id"), col("embedding")),
      emb.filter(col("vec_id") < 150),
      "vec_id", "embedding", "vec_id", "embedding", k = 4, lambdaPpm = 700000L)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.length == 12)
    // rank 1 of each query is its planted original (cos ≈ 1.0 dominates)
    a.filter(_._2 == 1).foreach { case (q, _, n, _) => assert(n == q - 1000000) }
  }

  test("mmr greedy: driver-local and distributed rounds agree bit for bit") {
    import spark.implicits._
    // every verb sharing the greedy engine, fixture-scale inputs with
    // real ties/near-ties; score_ppm equality pins the IEEE chain, not
    // just the pick order
    def all() = {
      val mmr = Similarity.mmrTopK(
        emb.filter(col("vec_id") < 3).select(
          (col("vec_id") + 1000000).as("vec_id"), col("embedding")),
        emb.filter(col("vec_id") < 150),
        "vec_id", "embedding", "vec_id", "embedding", k = 5, lambdaPpm = 700000L)
        .orderBy("query_id", "rank")
        .collect().map(_.toSeq).toSeq
      val kc = Similarity.kCenterSample(
        emb.filter(col("vec_id") < 120), "vec_id", "embedding", k = 6)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val div = Similarity.diverseSamplePerGroup(
        emb.filter(col("vec_id") < 90)
          .withColumn("grp", col("vec_id") % 3)
          .withColumn("q", (col("vec_id") % 7).cast("double") / 7.0),
        "grp", "vec_id", "embedding", "q", k = 3, lambdaPpm = 600000L)
        .orderBy("grp", "rank").collect().map(_.toSeq).toSeq
      (mmr, kc, div)
    }
    val local = all()
    // force the distributed loop (the corpus-scale path)
    spark.conf.set("spark.graft.mmr.localMaxCandidates", "0")
    val looped = try all() finally spark.conf.unset("spark.graft.mmr.localMaxCandidates")
    assert(local._1 == looped._1, "mmrTopK local vs loop divergence")
    assert(local._2 == looped._2, "kCenterSample local vs loop divergence")
    assert(local._3 == looped._3, "diverseSamplePerGroup local vs loop divergence")
  }

  test("mmr from index at full-recall knobs equals the in-memory arm row-for-row") {
    val corpus = emb.filter(col("vec_id") < 150)
    Similarity.writeIvfSqIndex(corpus, "vec_id", "embedding",
      "mmr_spec_ivf", nCentroids = 8, buckets = 4)
    val queries = emb.filter(col("vec_id") < 3).select(
      (col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val mem = rows(Similarity.mmrTopK(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 4, lambdaPpm = 700000L)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score_ppm")))
    val idx = rows(Similarity.mmrTopKFromIndex(spark, "mmr_spec_ivf", queries,
      "vec_id", "embedding", k = 4, shortlist = 150, nProbe = 8,
      lambdaPpm = 700000L)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score_ppm")))
    assert(idx == mem)
  }

  test("mmr from index: production knobs stay inside the shortlist") {
    val corpus = emb.filter(col("vec_id") < 150)
    Similarity.writeIvfSqIndex(corpus, "vec_id", "embedding",
      "mmr_spec_ivf2", nCentroids = 8, buckets = 4)
    val queries = emb.filter(col("vec_id") < 3).select(
      (col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val out = Similarity.mmrTopKFromIndex(spark, "mmr_spec_ivf2", queries,
      "vec_id", "embedding", k = 4, shortlist = 16, nProbe = 2)
      .collect()
    assert(out.length == 12)
    // rank 1 is still the planted original: the copy's list is always
    // probed (same assignment arithmetic) and cosine ≈ 1.0 wins
    out.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 1000000) }
  }

  test("kCenterSample: farthest-point order on a known geometry; seed is the lowest id") {
    import spark.implicits._
    // seed = 1 (lowest id, all round-1 scores tie); farthest from 1 is
    // 3 (orthogonal); then 4 (max-cos .71 to {1,3}) beats 2 (≈1.0 to 1)
    val pts = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.999, 0.045)),
      (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.7, 0.7))
    ).toDF("id", "vec")
    val out = Similarity.kCenterSample(pts, "id", "vec", k = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 4L, 2L))
    assert(out(0).getAs[Long]("max_cos_ppm") == 0L, "seed has no selected set")
    // among NON-SEED picks coverage is non-decreasing: each pick is the
    // least redundant remaining point, and redundancy only grows as the
    // selected set grows (the seed's conventional 0 sits outside the
    // invariant — later picks can be negative-cosine far)
    val cov = out.drop(1).map(_.getAs[Long]("max_cos_ppm")).toSeq
    assert(cov == cov.sorted, s"coverage not monotone: $cov")
  }

  test("kCenterSample: fixture-scale determinism and spread beats a prefix sample") {
    def run() = Similarity.kCenterSample(
      emb.filter(col("vec_id") < 120), "vec_id", "embedding", k = 8)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run()
    assert(a == run())
    assert(a.map(_._2).distinct.length == 8)
    // the traversal's max pairwise cosine must not exceed the first-8-
    // ids prefix sample's (diversity is the verb's whole point)
    def maxPairCos(ids: Set[Long]): Double = {
      val vs = emb.filter(col("vec_id").isin(ids.toSeq: _*))
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
      (for (i <- vs.indices; j <- vs.indices if i < j) yield {
        val d = vs(i).zip(vs(j)).map { case (x, y) => x * y }.sum
        d / (math.sqrt(vs(i).map(x => x * x).sum) * math.sqrt(vs(j).map(x => x * x).sum))
      }).max
    }
    assert(maxPairCos(a.map(_._2).toSet) <= maxPairCos((0L until 8L).toSet) + 1e-12)
  }

  test("diverseSamplePerGroup: quality wins rank 1, near-copies demote, groups select independently") {
    import spark.implicits._
    // group g1: 1 is the quality winner; 2 is a near-copy of 1 with
    // slightly lower quality (plain top-2 would take both); 3 is
    // distant with middling quality — MMR demotes 2 below 3.
    // group g2: only two rows, both selected, quality order.
    val rows = Seq(
      ("g1", 1L, Seq(0.9, 0.43589, 0.0, 0.0), 0.95),
      ("g1", 2L, Seq(0.85, 0.516, 0.107, 0.0), 0.90),
      ("g1", 3L, Seq(0.7, -0.51, 0.5, 0.0), 0.60),
      ("g2", 4L, Seq(1.0, 0.0, 0.0, 0.0), 0.20),
      ("g2", 5L, Seq(0.0, 1.0, 0.0, 0.0), 0.80)
    ).toDF("grp", "id", "vec", "quality")
    val out = Similarity.diverseSamplePerGroup(rows, "grp", "id", "vec",
      "quality", k = 3, lambdaPpm = 500000L)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // g1 at λ=0.5: r1 = 1 (.95); r2: 2 scores .5(.90−.99)<0,
    // 3 scores .5(.60−.41)>0 → 3; r3 = 2. g2: 5 (.80) then 4.
    assert(out.toSeq == Seq(("g1", 1, 1L), ("g1", 2, 3L), ("g1", 3, 2L),
      ("g2", 1, 5L), ("g2", 2, 4L)), out.toSeq.toString)
  }

  test("diverseSamplePerGroup: fixture labels, k per group, no cross-group leakage") {
    val out = Similarity.diverseSamplePerGroup(
      emb.filter(col("vec_id") < 200).withColumn("q",
        (col("vec_id") % 97).cast("double") / 97.0),
      "label", "vec_id", "embedding", "q", k = 3, lambdaPpm = 600000L)
      .collect()
    val byGroup = out.groupBy(_.getAs[Int]("label"))
    byGroup.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    // every pick belongs to its claimed group
    val membership = emb.filter(col("vec_id") < 200)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach(r =>
      assert(membership(r.getAs[Long]("vec_id")) == r.getAs[Int]("label")))
  }

  test("diverseSamplePerGroup: a NULL group selects k exemplars like any other") {
    import spark.implicits._
    val rows = Seq(
      (Some("g1"), 1L, Seq(1.0, 0.0), 0.9),
      (Some("g1"), 2L, Seq(0.0, 1.0), 0.5),
      (None, 3L, Seq(1.0, 0.0), 0.9),
      (None, 4L, Seq(0.0, 1.0), 0.5),
      (None, 5L, Seq(0.7, 0.7), 0.3)
    ).toDF("grp", "id", "vec", "quality")
    val out = Similarity.diverseSamplePerGroup(rows, "grp", "id", "vec",
      "quality", k = 3, lambdaPpm = 600000L).collect()
    val nullGroup = out.filter(_.isNullAt(0))
    assert(nullGroup.length == 3,
      s"null group must run all rounds, got ${nullGroup.length} picks")
    assert(nullGroup.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
    assert(out.count(!_.isNullAt(0)) == 2)
  }

  test("mmr guards: k and lambda ranges") {
    intercept[IllegalArgumentException](Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 0))
    intercept[IllegalArgumentException](Similarity.mmrTopK(tinyQuery, tiny,
      "query_id", "vec", "cand_id", "vec", k = 2, lambdaPpm = 1000001L))
  }
}
