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
    val spark = df.sparkSession
    val alreadyCached = spark.sharedState.cacheManager
      .lookupCachedData(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        df.queryExecution.logical).isDefined
    if (!alreadyCached) df.persist(level)
    df
  }
}
