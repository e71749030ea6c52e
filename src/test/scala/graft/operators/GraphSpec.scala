package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  import spark.implicits._

  // chain+bridge {1,2,3,5}, pair {10,11}, star {20,21,22,23}
  private val pairs7 = Seq(
    (1L, 2L), (2L, 3L), (5L, 3L),
    (10L, 11L),
    (20L, 21L), (20L, 22L), (20L, 23L))

  test("keeper election: hubs win, ties break to the lowest id, edge-free docs survive") {
    val docs = (1L to 25L).toDF("doc_id")
    val out = Graph.keepCentralPerCluster(docs, "doc_id", pairs7.toDF("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    // star keeps its hub 20 (degree 3); chain keeps 2 (degree 2, tied
    // with 3, lower id); pair keeps 10 (tie, lower id); 4,6..9,12..19,
    // 24,25 have no edges and survive untouched
    val dropped = Set(1L, 3L, 5L, 11L, 21L, 22L, 23L)
    assert(out === (1L to 25L).toSet -- dropped, out.toSeq.sorted.mkString(","))
  }

  test("keeper election: phantom pair ids neither vote nor stand") {
    // doc 2 was dropped upstream: its edges vanish, so the chain
    // cluster shrinks to {3,5} (kept 3, tie to lower id) and 1 becomes
    // edge-free — a phantom keeper or phantom-inflated degree would
    // change both outcomes
    val docs = (1L to 25L).filter(_ != 2L).toDF("doc_id")
    val out = Graph.keepCentralPerCluster(docs, "doc_id", pairs7.toDF("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    val dropped = Set(5L, 11L, 21L, 22L, 23L)
    assert(out === ((1L to 25L).toSet - 2L) -- dropped, out.toSeq.sorted.mkString(","))
  }

  test("pagerank: hub dominates, symmetric nodes tie, mass ~conserved, partition-invariant") {
    val df = pairs7.toDF("id_a", "id_b")
    val r = Graph.pageRankFixedPoint(df, iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.size === 10)
    // the star hub out-ranks every spoke; spokes are symmetric and tie
    assert(r(20L)._1 > r(21L)._1)
    assert(r(21L) === r(22L) && r(22L) === r(23L))
    // the isolated pair is fully symmetric
    assert(r(10L) === r(11L))
    // truncating division only LEAKS mass — total stays within a tight
    // band below 1e9 (each node loses < 1 ppb per div, per round)
    val mass = r.values.map(_._1).sum
    assert(mass <= 1000000000L && mass >= 999999000L, s"mass $mass")
    // exact integer arithmetic: repartitioned input, identical ranks
    val r2 = Graph.pageRankFixedPoint(df.repartition(7), iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r2 === r)
  }

  test("powerWalk: driver-local and distributed paths agree bit for bit on every flavor") {
    val df = pairs7.toDF("id_a", "id_b")
    val weighted = pairs7.zipWithIndex
      .map { case ((a, b), i) => (a, b, 100L + 37L * i) }
      .toDF("id_a", "id_b", "w")
    val seeds = Seq(20L, 1L).toDF("id")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).sortBy(_._1)
    def all() = Seq(
      rows(Graph.pageRankFixedPoint(df, iters = 3)),
      rows(Graph.pageRankWeighted(weighted, "w", iters = 3)),
      rows(Graph.personalizedPageRank(df, seeds, iters = 4)),
      rows(Graph.personalizedPageRankWeighted(weighted, "w", seeds, iters = 4)))
    val local = all()
    // force the distributed power-iteration loop (the 100 TB path)
    spark.conf.set("spark.graft.graph.localMaxEdges", "0")
    val looped = try all() finally spark.conf.unset("spark.graft.graph.localMaxEdges")
    local.zip(looped).zipWithIndex.foreach { case ((l, d), i) =>
      assert(l.toSeq === d.toSeq, s"flavor $i local vs loop divergence")
    }
  }

  test("keeper election composes with real near-dup pairs: one survivor per cluster") {
    // the production composition: minhash candidate pairs over the
    // fixture + planted duplicates feed the election directly
    val docs = table("documents").select("doc_id", "text")
    val planted = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val all = docs.union(planted)
    val pairs = Dedup.minhashNearDupPairs(all, "doc_id", "text",
      shingleSize = 8, k = 16, bands = 8, threshold = 0.7)
      .select(col("id_a"), col("id_b"))
    val kept = Graph.keepCentralPerCluster(all, "doc_id", pairs)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    // survivors are a subset of the corpus, and every duplicate
    // cluster retains EXACTLY one member
    assert(keptIds.subsetOf(all.collect().map(_.getLong(0)).toSet))
    val clusters = Dedup.duplicateClusters(pairs)
      .join(all.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byCluster.foreach { case (c, members) =>
      assert((members & keptIds).size === 1, s"cluster $c kept ${(members & keptIds).size}")
    }
    // docs with no duplicate edge all survive
    val clustered = clusters.map(_._1).toSet
    val edgeFree = all.collect().map(_.getLong(0)).toSet -- clustered
    assert(edgeFree.subsetOf(keptIds))
  }

  test("personalized pagerank: rank decays from the seed, unreachable components read zero") {
    val df = pairs7.toDF("id_a", "id_b")
    val seeds = Seq(20L).toDF("id")
    val r = Graph.personalizedPageRank(df, seeds, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // distance decay within the star: hub > its spokes > everything else
    assert(r(20L) > r(21L) && r(21L) > 0L)
    assert(r(21L) === r(22L) && r(22L) === r(23L))
    // components the walk can't reach from the seed converge to zero
    assert(r(1L) === 0L && r(10L) === 0L && r(11L) === 0L, r.toString)
    // truncating arithmetic only leaks mass downward
    assert(r.values.sum <= 1000000000L)
    // a seed with no edges in the graph is rejected loudly
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(df, Seq(999L).toDF("id"), iters = 2).collect()
    }
  }

  test("keeper election: an all-phantom pair list leaves every doc untouched") {
    // every pair endpoint was dropped upstream -> the live graph is
    // empty, no cluster exists, and the election must be a no-op
    // rather than an empty-aggregate error
    val docs = (100L to 110L).toDF("doc_id")
    val out = Graph.keepCentralPerCluster(docs, "doc_id", pairs7.toDF("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    assert(out === (100L to 110L).toSet)
  }

  test("weighted pagerank: heavy spokes out-rank light ones; w = 1 IS the uniform walk") {
    val wPairs = Seq(
      (1L, 2L, 500000L), (2L, 3L, 900000L), (5L, 3L, 100000L),
      (10L, 11L, 700000L),
      (20L, 21L, 300000L), (20L, 22L, 300000L), (20L, 23L, 900000L))
      .toDF("id_a", "id_b", "w")
    val r = Graph.pageRankWeighted(wPairs, "w", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the star's 0.9-weight spoke receives 3x its siblings' share
    assert(r(23L) > r(21L), r.toString)
    assert(r(21L) === r(22L))
    // weight 1 on every edge reduces to the uniform walk bit-for-bit
    // (r·1 div strength = r div degree)
    val ones = pairs7.map { case (a, b) => (a, b, 1L) }.toDF("id_a", "id_b", "w")
    val viaW = Graph.pageRankWeighted(ones, "w", iters = 3)
      .select("id", "rank_ppb", "degree")
      .collect().map(_.toString).sorted.toSeq
    val uni = Graph.pageRankFixedPoint(pairs7.toDF("id_a", "id_b"), iters = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaW === uni)
    // a zero weight would pad strength while contributing nothing —
    // rejected loudly instead
    val bad = (pairs7.map { case (a, b) => (a, b, 1L) } :+ ((1L, 5L, 0L)))
      .toDF("id_a", "id_b", "w")
    val ex = intercept[Exception] {
      Graph.pageRankWeighted(bad, "w", iters = 1).collect()
    }
    assert(ex.getMessage.contains("non-positive") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-positive")), ex.toString)
    // a NULL weight must fail the same way — when(w <= 0, err) alone
    // evaluates to null for null weights, silently losing rank mass
    val nullW = Seq((1L, 2L, Some(5L)), (2L, 3L, None))
      .toDF("id_a", "id_b", "w")
    val exN = intercept[Exception] {
      Graph.pageRankWeighted(nullW, "w", iters = 1).collect()
    }
    assert(exN.getMessage.contains("non-positive") ||
      Option(exN.getCause).exists(_.getMessage.contains("non-positive")), exN.toString)
  }

  test("combined walk: seed mass flows along weights; w = 1 IS the personalized walk") {
    val wPairs = Seq(
      (1L, 2L, 500000L), (2L, 3L, 900000L), (5L, 3L, 100000L),
      (10L, 11L, 700000L),
      (20L, 21L, 300000L), (20L, 22L, 300000L), (20L, 23L, 900000L))
      .toDF("id_a", "id_b", "w")
    val seeds = Seq(20L).toDF("id")
    val r = Graph.personalizedPageRankWeighted(wPairs, "w", seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the heavy spoke receives more of the seed's mass; unreachable
    // components still read zero
    assert(r(23L) > r(21L) && r(21L) === r(22L), r.toString)
    assert(r(1L) === 0L && r(10L) === 0L)
    // unit weights reduce to the personalized walk bit-for-bit
    val ones = pairs7.map { case (a, b) => (a, b, 1L) }.toDF("id_a", "id_b", "w")
    val viaW = Graph.personalizedPageRankWeighted(ones, "w", seeds, iters = 3)
      .select("id", "rank_ppb", "degree", "is_seed")
      .collect().map(_.toString).sorted.toSeq
    val ppr = Graph.personalizedPageRank(pairs7.toDF("id_a", "id_b"), seeds, iters = 3)
      .select("id", "rank_ppb", "degree", "is_seed")
      .collect().map(_.toString).sorted.toSeq
    assert(viaW === ppr)
  }

  test("pagerank converges toward the degree-proportional stationary ranking") {
    // on an undirected graph PageRank's stationary distribution orders
    // by degree; after a few rounds the fixed-point iteration must
    // agree on the fixture's degree ranking (3 > 2 > 1)
    val r = Graph.pageRankFixedPoint(pairs7.toDF("id_a", "id_b"), iters = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byDeg = r.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    assert(byDeg(3L) > byDeg(2L) && byDeg(2L) > byDeg(1L), byDeg.toString)
  }
}
