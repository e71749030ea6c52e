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
      pairs: DataFrame, iters: Int, dampPpm: Long = 850000L): DataFrame =
    powerWalk(pairs, iters, dampPpm, seeds = None).drop("is_seed", "strength")

  /** Weight-proportional PageRank: each edge carries a positive BIGINT
    * weight (a near-dup pair's `jaccard_ppm`, a link count, a byte
    * mass), and a node's rank flows to its neighbors in proportion —
    * `share(u→v) = r(u)·w(u,v) div strength(u)` with `strength` the
    * node's total outgoing weight, so a 0.9-similarity duplicate pulls
    * 3× the mass of a 0.3 one instead of tying. Same walk, same exact
    * integer arithmetic ([[powerWalk]] with w = 1 IS the uniform
    * walk), same unrolled DuckDB twin. Duplicate and mirrored input
    * pairs sum their weights; non-positive weights fail loudly (a zero
    * weight would pad `strength` while contributing nothing — silently
    * deflating every sibling edge's share).
    *
    * Output: (id, rank_ppb, degree, strength).
    */
  def pageRankWeighted(
      pairs: DataFrame, weightCol: String, iters: Int,
      dampPpm: Long = 850000L): DataFrame =
    powerWalk(pairs, iters, dampPpm, seeds = None, weightCol = Some(weightCol))
      .drop("is_seed")

  /** Personalized PageRank from a seed set — the curated-seed quality
    * propagation read ("how close is every document to the vetted
    * seeds, through the near-dup/link graph"): the teleport mass lands
    * ONLY on seeds instead of uniformly, so rank decays with graph
    * distance from the seed set and un-reachable nodes converge to 0.
    * Same walk as [[pageRankFixedPoint]] — ONE parameterized loop owns
    * the round dataflow, so the two can never drift — with the seed
    * set riding the plan as a broadcast membership flag. Seeds not
    * present in the pair graph contribute nothing (documented: an
    * isolated seed has no edges to propagate through).
    *
    * Output: (id, rank_ppb, degree, is_seed).
    */
  def personalizedPageRank(
      pairs: DataFrame,
      seeds: DataFrame, // one column: id
      iters: Int,
      dampPpm: Long = 850000L): DataFrame =
    powerWalk(pairs, iters, dampPpm, seeds = Some(seeds))

  /** [[personalizedPageRank]] × [[pageRankWeighted]] — seed-anchored
    * teleport AND similarity-proportional flow together: "how close is
    * each document to the curated seeds, counting a 0.9-similarity
    * hop as three 0.3 ones". The most production-shaped read of the
    * four walks, and free by construction: the one parameterized
    * [[powerWalk]] already owns both axes, so this is a binding, not
    * an implementation.
    *
    * Output: (id, rank_ppb, degree, strength, is_seed).
    */
  def personalizedPageRankWeighted(
      pairs: DataFrame,
      weightCol: String,
      seeds: DataFrame,
      iters: Int,
      dampPpm: Long = 850000L): DataFrame =
    powerWalk(pairs, iters, dampPpm, seeds = Some(seeds),
      weightCol = Some(weightCol))

  /** The shared power-iteration loop: teleport mass lands on the
    * `is_seed` nodes — every node for the uniform walk, the seed set
    * for the personalized one. Each round is one equi-join
    * (edges ⋈ ranks) plus one sum aggregate; the outer join back to
    * the node set keeps nodes that received nothing this round at
    * their teleport term (routine in the personalized walk; a no-op
    * in the uniform walk, where the symmetric graph gives every node
    * in-edges). The result is `localCheckpoint`-materialized BEFORE
    * the edge/degree caches are dropped — returning it lazy would
    * hand the caller a plan whose cached inputs were just unpersisted
    * (the [[Dedup.duplicateClusters]] rule).
    */
  private def powerWalk(
      pairs: DataFrame, iters: Int, dampPpm: Long,
      seeds: Option[DataFrame],
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1 && dampPpm >= 0L && dampPpm <= 1000000L)
    // weighted edges: symmetrize keeping weights, sum duplicates, and
    // refuse non-positive mass; unweighted edges ride weight 1, which
    // makes the weighted share formula degrade to the uniform one
    // exactly (r·1 div strength = r div degree)
    val rawEdges = weightCol match {
      case Some(wc) =>
        // the guard must name NULL explicitly: `when(w <= 0, err)` is
        // itself null for a null weight, so without the isNull arm a
        // null-weight edge would silently carry null strength/shares
        // and LOSE rank mass instead of failing as documented
        val w = when(col(wc).isNull || col(wc).cast("long") <= 0L,
          raise_error(concat(lit("pageRankWeighted: non-positive weight "),
            coalesce(col(wc).cast("string"), lit("NULL")))))
          .otherwise(col(wc).cast("long"))
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"), w.as("__w"))
          .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), w.as("__w")))
          .groupBy("src", "dst").agg(sum(col("__w")).as("__w"))
      case None => edgesOf(pairs).withColumn("__w", lit(1L))
    }
    // cached PRE-PARTITIONED by src: the loop equi-joins edges on src
    // every round, and the groupBy(src,dst) build partitioning doesn't
    // satisfy clustering-by-src — without this the edge frame (the
    // graph's biggest) re-exchanged once per iteration; now the one
    // exchange happens at build and every round's join and the degree
    // aggregate reuse it (guide §2.4: two operations keyed the same
    // way share one exchange)
    val edges = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      rawEdges.repartition(col("src")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Hybrid local/distributed walk (the [[Dedup.duplicateClusters]]
    // rule applied to the rank loop): one bounded count sizes the edge
    // cache, and below `spark.graft.graph.localMaxEdges` (default
    // 1 000 000 — the broadcast size class; the SEED set is already a
    // broadcast in the distributed path, so collecting it makes no new
    // assumption) the whole power iteration runs on the driver over the
    // collected edge list. Every operation is the SAME `· div +` on
    // BIGINTs the distributed rounds execute — exact integer
    // arithmetic is replay-order-free, so the local result is
    // bit-identical (GraphSpec pins local == loop on every walk
    // flavor). `iters` join+aggregate+checkpoint rounds collapse into
    // one collect; the 100 TB path above the bound is untouched.
    val localMax = pairs.sparkSession.conf
      .get("spark.graft.graph.localMaxEdges", "1000000").toLong
    val longIds =
      edges.schema("src").dataType == org.apache.spark.sql.types.LongType &&
      edges.schema("dst").dataType == org.apache.spark.sql.types.LongType
    if (longIds && edges.count() <= localMax)
      return localWalk(edges, iters, dampPpm, seeds)
    val degBase = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"), sum(col("__w")).as("strength"))
    val deg = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      seeds match {
        case Some(sd) =>
          val ids = sd.select(col(sd.columns.head).cast("long").as("id")).distinct()
          degBase
            .join(broadcast(ids.select(col("id"), lit(true).as("__seed"))),
              Seq("id"), "left_outer")
            .select(col("id"), col("degree"), col("strength"),
              coalesce(col("__seed"), lit(false)).as("is_seed"))
        case None => degBase.withColumn("is_seed", lit(true))
      },
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the teleport-set size is a one-row aggregate over the (bounded)
    // pair-graph node set, like the CC convergence witness
    val nTel = deg.filter(col("is_seed")).count()
    require(nTel > 0,
      if (seeds.isDefined) "no seed is present in the pair graph"
      else "empty pair graph — nothing to rank")
    val base = (1000000000L * (1000000L - dampPpm)) / 1000000L / nTel
    val seedBase = when(col("is_seed"), lit(base)).otherwise(lit(0L))
    // the per-edge flow denominator is LOOP-INVARIANT: pre-join each
    // edge with its source's strength once (both sides are cached
    // partitioned/keyed by src, so the build join is exchange-free)
    // instead of re-joining deg inside every round — one equi-join per
    // round, exactly what the scaladoc promises
    val flowEdges = org.apache.spark.sql.graftbridge.CacheBridge.persistOnce(
      edges.join(deg.select(col("id").as("src"), col("strength")), Seq("src")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.select(col("id"),
      when(col("is_seed"), lit(1000000000L / nTel)).otherwise(lit(0L))
        .as("rank_ppb"))
    var i = 0
    while (i < iters) {
      val contrib = flowEdges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          call_function("div", col("rank_ppb") * col("__w"), col("strength"))
            .as("__share"))
        .groupBy("id")
        .agg(sum(col("__share")).as("__in"))
      ranks = deg.select(col("id"), col("is_seed"))
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (seedBase + call_function("div",
            lit(dampPpm) * coalesce(col("__in"), lit(0L)), lit(1000000L)))
            .as("rank_ppb"))
        .localCheckpoint(true)
      i += 1
    }
    val out = ranks.join(deg, Seq("id")).localCheckpoint(true)
    flowEdges.unpersist()
    edges.unpersist()
    deg.unpersist()
    out
  }

  /** Driver-side power iteration for [[powerWalk]]'s small-graph path:
    * the identical ppb/ppm fixed-point recurrence
    * (`share = r·w div strength`, `r' = seedBase + damp·Σshare div 1e6`,
    * truncating division — all values non-negative, so Java `/` IS the
    * SQL `div`) over the ALREADY-BOUNDED collected edge list, returned
    * as a LocalRelation with the distributed output's exact schema.
    * The weight guard (`raise_error` on non-positive) fires during the
    * collect — same failure surface as the distributed rounds.
    */
  private def localWalk(
      edges: DataFrame, iters: Int, dampPpm: Long,
      seeds: Option[DataFrame]): DataFrame = {
    val spark = edges.sparkSession
    val rows = edges.collect()
    edges.unpersist()
    val es = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val degree = scala.collection.mutable.HashMap.empty[Long, Long]
    val strength = scala.collection.mutable.HashMap.empty[Long, Long]
    es.foreach { case (s, _, w) =>
      degree(s) = degree.getOrElse(s, 0L) + 1L
      strength(s) = strength.getOrElse(s, 0L) + w
    }
    // insertion-ordered node list: deterministic output framing
    val nodes = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      es.foreach { case (s, d, _) => seen += s; seen += d }
      seen.toArray
    }
    val isSeed: Long => Boolean = seeds match {
      case Some(sd) =>
        // the distributed path broadcasts exactly this set — collecting
        // it is the same smallness assumption
        val set = sd.select(col(sd.columns.head).cast("long").as("id"))
          .distinct().collect().map(_.getLong(0)).toSet
        set.contains
      case None => _ => true
    }
    val nTel = nodes.count(isSeed)
    require(nTel > 0,
      if (seeds.isDefined) "no seed is present in the pair graph"
      else "empty pair graph — nothing to rank")
    val base = (1000000000L * (1000000L - dampPpm)) / 1000000L / nTel
    var rank = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach(v => rank(v) = if (isSeed(v)) 1000000000L / nTel else 0L)
    var i = 0
    while (i < iters) {
      val in = scala.collection.mutable.HashMap.empty[Long, Long]
      es.foreach { case (s, d, w) =>
        in(d) = in.getOrElse(d, 0L) + (rank(s) * w) / strength(s)
      }
      val next = scala.collection.mutable.HashMap.empty[Long, Long]
      nodes.foreach { v =>
        next(v) = (if (isSeed(v)) base else 0L) +
          (dampPpm * in.getOrElse(v, 0L)) / 1000000L
      }
      rank = next
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.length)
    nodes.foreach { v =>
      out.add(org.apache.spark.sql.Row(
        v, rank(v), degree(v), strength(v), isSeed(v)))
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType), StructField("rank_ppb", LongType),
      StructField("degree", LongType), StructField("strength", LongType),
      StructField("is_seed", BooleanType))))
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
