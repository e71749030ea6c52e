package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact baseline. Queries broadcast (small side),
  *    scores computed in one pass over the corpus, top-k selected with a
  *    two-phase partial/final reduction so no executor ever materializes
  *    a full per-query score list. At 100 TB: corpus-side scan is the
  *    only full pass; shuffle carries ≤ (partitions × queries × k) rows.
  *  - [[lshTopK]] — scale path. Corpus bucketed once by a random-
  *    hyperplane signature; each query probes only its own bucket
  *    (`probeBits` trades recall for cost).
  */
object Similarity {

  /** Exact cosine top-k per query.
    *
    * @param queries small DataFrame (id, vector) — gets broadcast
    * @param corpus  large DataFrame (id, vector)
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
      .withColumn("__qn", VectorFunctions.norm(col("__qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        pairCosine.as("cosine")
      )
    topKPerKey(scored, "query_id", k)
  }

  /** Cosine from a precomputed-norm pair (norms evaluated once per row,
    * not once per candidate pair).
    */
  private def pairCosine =
    when(col("__qn") * col("__cn") === 0.0, lit(0.0))
      .otherwise(VectorFunctions.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))

  /** Two-phase per-key top-k: partial top-k inside each partition (no
    * shuffle), then final top-k per key. The collect_list in phase 2 sees
    * at most partitions×k rows per key, never the corpus.
    */
  private[operators] def topKPerKey(scored: DataFrame, keyCol: String, k: Int): DataFrame = {
    val item = struct(
      (col("cosine") * -1).as("neg"), // struct sort: ascending neg = descending cosine
      col("neighbor_id")
    )
    val partial = scored
      .withColumn("__pid", spark_partition_id())
      .groupBy(col(keyCol), col("__pid"))
      .agg(slice(array_sort(collect_list(item)), 1, k).as("__top"))
    val fin = partial
      .select(col(keyCol), explode(col("__top")).as("__i"))
      .groupBy(col(keyCol))
      .agg(slice(array_sort(collect_list(col("__i"))), 1, k).as("__top"))
    fin
      .select(col(keyCol), posexplode(col("__top")).as(Seq("__rank", "__i")))
      .select(
        col(keyCol),
        (col("__rank") + 1).as("rank"),
        col("__i.neighbor_id").as("neighbor_id"),
        (col("__i.neg") * -1).as("cosine")
      )
  }

  /** LSH-bucketed approximate top-k: join queries to corpus rows sharing
    * the hyperplane-signature bucket, score, reduce. Exactness recovered
    * as `nBits → 0`; cost shrinks ~2^nBits-fold.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      nBits: Int = 8
  ): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
      .withColumn("__bucket", VectorFunctions.lshSignature(col("__qv"), nBits))
      .withColumn("__qn", VectorFunctions.norm(col("__qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv"))
      .withColumn("__bucket", VectorFunctions.lshSignature(col("__cv"), nBits))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    val scored = c
      .join(broadcast(q), Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        pairCosine.as("cosine")
      )
    topKPerKey(scored, "query_id", k)
  }
}
