package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for 100 TB workloads — the two cases where Catalyst's
  * default shuffle-hash/sort-merge plan is the bottleneck:
  *
  *  - **Bucketing** ([[writeBucketed]]): pre-shuffle both fact tables once
  *    at write time; every later equi-join on the bucket key is
  *    exchange-free. The shuffle you'd pay per query is paid once per
  *    ingest.
  *  - **Salting** ([[saltedJoin]]): a hot key floods one reducer in a
  *    shuffle join. Spreading the large side over `saltBuckets`
  *    sub-partitions and replicating the small side restores balance.
  *    (AQE's skew-join split handles moderate skew automatically; salting
  *    is for the pathological key that AQE can't subdivide — e.g. a
  *    single null-ish join key that is 30% of the table.)
  */
object ScaleJoins {

  /** Persist `df` as a bucketed+sorted table. Joins between two tables
    * bucketed on the same key with the same bucket count need no
    * exchange and no sort.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      buckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Equi-join of two same-bucketed catalog tables — verify with
    * `.explain`: no Exchange on either side.
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"
  ): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Skew-resistant equi-join: the (large, skewed) side gets a random-ish
    * but *deterministic* salt derived from row content; the small side is
    * replicated `saltBuckets` times. Join key becomes (key, salt), so the
    * hot key's rows spread over `saltBuckets` reducers.
    *
    * @param large      skewed big side
    * @param small      replicable side (≤ broadcast-ish size × saltBuckets)
    * @param key        equi-join column present on both sides
    * @param saltBuckets fan-out factor for hot keys
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltBuckets > 0)
    // deterministic salt: hash of the whole row spreads a hot key's rows
    // uniformly without RNG (reproducible plans, stable retries)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
