package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists — the duplicate-candidate graph
  * ([[Dedup.minhashNearDupPairs]] and family) doubles as a link graph,
  * and two reads off it matter to a corpus pipeline beyond the
  * connected components [[Dedup.duplicateClusters]] already extracts:
  * WHICH member should represent a cluster (centrality-based keeper
  * election — the most-connected member is the one most duplicates
  * are near, a better canonical pick than the arbitrary lowest id),
  * and how IMPORTANT a node is globally (fixed-point PageRank — the
  * web-graph quality prior corpus curation pipelines weight documents
  * by).
  *
  * House rule: all scores are exact integer arithmetic (truncating
  * `div`, ppb/ppm fixed point) so every gate replays bit-for-bit in
  * ANSI SQL — PageRank here is RNG-free and tolerance-free.
  *
  * Reference analog: none — the reference engine (OracleSync2MySQL)
  * has no graph surface; this is training-data-pipeline extension
  * surface beside the dedup family.
  */
object Graph {

  /** Symmetrized distinct edge list (src, dst) from (id_a, id_b)
    * pairs — the [[Dedup.duplicateClusters]] normalization, shared so
    * degree, PageRank and CC all see the same graph.
    */
  private def edgesOf(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()

  /** Undirected degree per node: one distinct + one count aggregate,
    * both shuffling (node, neighbor) pairs only — never documents.
    */
  def degreeCentrality(pairs: DataFrame): DataFrame =
    edgesOf(pairs).groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))

  /** Fixed-point PageRank over the symmetrized pair graph: `iters`
    * power-iteration rounds of
    * `r' = (1−d)/N + d · Σ_{u→v} r(u) div deg(u)` with ranks held in
    * integer parts-per-billion and damping in ppm — every operation is
    * `· div +` on BIGINTs, so the result is deterministic, replay-
    * order-free, and exactly reproducible by any integer SQL engine
    * (the gate unrolls the iterations in DuckDB). Truncating division
    * leaks a few ppb of mass per round — deterministic either side,
    * and irrelevant to the RANKING read the score exists for.
    *
    * Scale shape: one equi-join (edges ⋈ ranks) plus one sum aggregate
    * per round — state is one long per node, traffic one row per edge;
    * `localCheckpoint` pins the plan shape per round exactly as the CC
    * loop does ([[Dedup.duplicateClusters]]), so `iters` can grow
    * without growing the plan. The symmetrized graph has no dangling
    * nodes (every node has out-degree ≥ 1), so no mass-redistribution
    * special case exists to diverge on.
    *
    * Output: (id, rank_ppb, degree), one row per node of the pair
    * graph.
    */
  def pageRankFixedPoint(
      pairs: DataFrame, iters: Int, dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1 && dampPpm >= 0L && dampPpm <= 1000000L)
    val edges = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      edgesOf(pairs), org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // N is the pair graph's node count — bounded by the candidate-pair
    // stage, and a one-row aggregate like the CC convergence witness
    val n = deg.count()
    require(n > 0, "empty pair graph — nothing to rank")
    val base = (1000000000L * (1000000L - dampPpm)) / 1000000L / n
    var ranks = deg.select(col("id"), lit(1000000000L / n).as("rank_ppb"))
    var i = 0
    while (i < iters) {
      ranks = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg.select(col("id").as("src"), col("degree")), Seq("src"))
        .select(col("dst").as("id"),
          call_function("div", col("rank_ppb"), col("degree")).as("__share"))
        .groupBy("id")
        .agg((lit(base) +
          call_function("div", lit(dampPpm) * sum(col("__share")), lit(1000000L)))
          .as("rank_ppb"))
        .localCheckpoint(true)
      i += 1
    }
    val out = ranks.join(deg, Seq("id"))
    edges.unpersist()
    deg.unpersist()
    out
  }

  /** Personalized PageRank from a seed set — the curated-seed quality
    * propagation read ("how close is every document to the vetted
    * seeds, through the near-dup/link graph"): the teleport mass lands
    * ONLY on seeds instead of uniformly, so rank decays with graph
    * distance from the seed set and un-reachable nodes converge to 0.
    * Same exact ppb integer arithmetic, join-per-round dataflow and
    * plan-pinning `localCheckpoint` as [[pageRankFixedPoint]]; the
    * seed set rides the plan as a broadcast membership flag. Seeds not
    * present in the pair graph contribute nothing (documented: an
    * isolated seed has no edges to propagate through).
    *
    * Output: (id, rank_ppb, degree, is_seed).
    */
  def personalizedPageRank(
      pairs: DataFrame,
      seeds: DataFrame, // one column: id
      iters: Int,
      dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1 && dampPpm >= 0L && dampPpm <= 1000000L)
    val edges = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      edgesOf(pairs), org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedIds = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct()
    val deg = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
        .join(broadcast(seedIds.select(col("id"), lit(true).as("__seed"))),
          Seq("id"), "left_outer")
        .select(col("id"), col("degree"),
          coalesce(col("__seed"), lit(false)).as("is_seed")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSeeds = deg.filter(col("is_seed")).count()
    require(nSeeds > 0, "no seed is present in the pair graph")
    // teleport: (1−d) split over the SEEDS; start mass likewise
    val base = (1000000000L * (1000000L - dampPpm)) / 1000000L / nSeeds
    val seedBase = when(col("is_seed"), lit(base)).otherwise(lit(0L))
    var ranks = deg.select(col("id"),
      when(col("is_seed"), lit(1000000000L / nSeeds)).otherwise(lit(0L))
        .as("rank_ppb"))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg.select(col("id").as("src"), col("degree")), Seq("src"))
        .select(col("dst").as("id"),
          call_function("div", col("rank_ppb"), col("degree")).as("__share"))
        .groupBy("id")
        .agg(sum(col("__share")).as("__in"))
      // outer join against ALL nodes: a node that received nothing this
      // round still holds its teleport mass (0 for non-seeds) — unlike
      // the uniform walk, zero-in-degree-from-ranked nodes are routine
      ranks = deg.select(col("id"), col("is_seed"))
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (seedBase + call_function("div",
            lit(dampPpm) * coalesce(col("__in"), lit(0L)), lit(1000000L)))
            .as("rank_ppb"))
        .localCheckpoint(true)
      i += 1
    }
    val out = ranks.join(deg, Seq("id"))
    edges.unpersist()
    deg.unpersist()
    out
  }

  /** Centrality-based keeper election: like
    * [[Dedup.keepKPerCluster]]'s k = 1 but the survivor of each
    * duplicate cluster is its MOST CONNECTED member (highest degree
    * among members present in `docs`, ties to the lowest id) instead
    * of the arbitrary lowest id — the member most duplicates are near
    * is the best canonical representative (SemDeDup-style medoid
    * election, on graph structure instead of embedding distance).
    * Phantom pair ids (docs an upstream filter dropped) neither count
    * toward degree nor stand for election — the
    * [[Dedup.keepKPerCluster]] phantom rule. Edge-free docs survive
    * untouched.
    *
    * Dataflow: CC labels + a degree aggregate + one min-struct
    * aggregate per cluster — every stage shuffles (id, label/degree)
    * rows, never documents; the election state is one struct per
    * cluster.
    */
  def keepCentralPerCluster(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame): DataFrame = {
    val present = docs.select(col(idCol).as("id"))
    // restrict the graph to present docs BEFORE degree: an edge to a
    // phantom id must not buy its surviving endpoint centrality
    val livePairs = pairs
      .join(present.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(present.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val clusters = Dedup.duplicateClusters(livePairs)
    val elected = clusters
      .join(degreeCentrality(livePairs), Seq("id"))
      .groupBy("cluster")
      // min over (−degree, id): highest degree wins, ties to lowest id
      .agg(min(struct((col("degree") * -1).as("nd"), col("id"))).as("__w"))
      .select(col("__w.id").as(idCol), lit(true).as("__keep"))
    val clustered = clusters.select(col("id").as(idCol), lit(true).as("__in"))
    docs
      .join(clustered, Seq(idCol), "left_outer")
      .join(elected, Seq(idCol), "left_outer")
      .filter(col("__in").isNull || col("__keep").isNotNull)
      .drop("__in", "__keep")
  }
}
