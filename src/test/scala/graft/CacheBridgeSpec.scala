package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CacheBridge
import org.apache.spark.storage.StorageLevel

/** persistOnce exists so bench reps and retries re-invoking an operator
  * with a structurally identical plan reuse the first persist instead
  * of re-registering (and warning) every call. The lookup must run on
  * the ANALYZED plan — the cache manager normalizes but never analyzes,
  * so an unresolved plan can never match a cached analyzed one.
  */
class CacheBridgeSpec extends SparkSpec {

  test("persistOnce: an independently constructed identical plan is seen as cached") {
    val a = table("nation").select(col("n_nationkey"), xxhash64(col("n_name")).as("h"))
    try {
      CacheBridge.persistOnce(a, StorageLevel.MEMORY_AND_DISK)
      assert(CacheBridge.isCached(a))
      // fresh DataFrame, fresh unresolved columns, same structure —
      // exactly what a second bench rep builds
      val b = table("nation").select(col("n_nationkey"), xxhash64(col("n_name")).as("h"))
      assert(CacheBridge.isCached(b),
        "identical re-plan not recognized: persistOnce would re-register every rep")
      CacheBridge.persistOnce(b, StorageLevel.MEMORY_AND_DISK)
    } finally {
      a.unpersist(blocking = true)
      ()
    }
  }

  test("persistOnce: a different plan is not treated as cached") {
    val a = table("region").select(col("r_regionkey"))
    try {
      CacheBridge.persistOnce(a, StorageLevel.MEMORY_AND_DISK)
      val other = table("region").select(col("r_regionkey"), col("r_name"))
      assert(!CacheBridge.isCached(other))
    } finally {
      a.unpersist(blocking = true)
      ()
    }
  }
}
