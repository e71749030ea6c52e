package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bridge into the session's `private[sql]` CacheManager — for
  * idempotent persist: operators that cache an intermediate (e.g. the
  * minhash signature frame) are re-invoked with structurally identical
  * plans by benchmarks and retries; persisting again would re-register
  * the same plan and log "Asked to cache already cached data" per call.
  * Reusing the existing cache entry is both the quiet and the correct
  * behavior. Lives under org.apache.spark.sql for package-private
  * access, same as [[ColumnBridge]].
  */
object CacheBridge {

  /** Persist `df` unless an equivalent plan is already cached, in which
    * case the cached incarnation is reused as-is.
    */
  def persistOnce(df: DataFrame, level: StorageLevel): DataFrame = {
    if (!isCached(df)) df.persist(level)
    df
  }

  /** Drop the cache entry for `df`'s plan (no-op when absent) — the
    * release valve for loops that would otherwise accumulate one
    * [[persistOnce]] entry per iteration (a perpetual stream's
    * per-batch signature frames). Non-cascading: derived cached plans
    * stay.
    */
  def uncache(df: DataFrame): Unit = {
    val spark = df.sparkSession
    spark.sharedState.cacheManager.uncacheQuery(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed, cascade = false)
  }

  /** Materialized byte size (memory + disk blocks) of an eagerly
    * locally-checkpointed DataFrame's backing RDD, -1 when the frame is
    * not a checkpoint or its blocks are gone. Lets an operator make a
    * MEASURED broadcast decision (compare against
    * `autoBroadcastJoinThreshold`) for a frame whose planner estimate
    * is useless — the localCheckpoint alternative to persistOnce keeps
    * no CacheManager entry (GC-managed, the leak fix) but also no
    * post-materialization InMemoryRelation stats, so the operator
    * measures instead.
    */
  def localCheckpointSize(df: DataFrame): Long =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .getOrElse(-1L)
      case _ => -1L
    }

  /** Whether an equivalent plan is already registered with the cache.
    * The lookup must see the ANALYZED plan: `lookupCachedData`
    * normalizes but never analyzes, so an unresolved logical plan
    * compares Unresolved* nodes against cached analyzed plans and
    * always misses.
    */
  def isCached(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    spark.sharedState.cacheManager
      .lookupCachedData(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        df.queryExecution.analyzed).isDefined
  }
}
