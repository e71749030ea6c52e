package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Tuned for the local[32] test harness but with settings chosen for a
  * multi-executor cluster: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing), shuffle partitions sized to the harness cores
  * (override on a real cluster), UTC session zone so timestamp semantics
  * are deployment-independent (the reference's local-zone string
  * round-trip at cmd/root.go:400-421 is a correctness wart we fix).
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // spill-awareness at 100 TB: the default 128m
      // spark.sql.files.maxPartitionBytes keeps a scan task's working
      // set bounded and is deliberately left untouched; the shuffle
      // partition count above tracks cores and should be raised with
      // the cluster (AQE coalescing trims the excess), never lowered
      .config("spark.ui.enabled", "false")
  }

  /** Local session for tests / CLI runs outside spark-submit. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    builder(appName).master(s"local[$cpus]").getOrCreate()
  }

  /** Harness-only log hygiene: reading a `_version_info` annotation
    * sidecar by explicit path makes Spark's `DataSource` warn "All
    * paths were ignored" (the `_` prefix trips its data-path filter)
    * even though the read succeeds — benign, but sbt tags the stderr
    * line `[error]` and it reads like a failure in CI logs. Raise
    * that ONE logger past WARN. Called by the Bench/Verify/CLI mains
    * only — the library itself never touches global log config.
    */
  def silenceSidecarPathNoise(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
}
