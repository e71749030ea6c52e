package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for the
  * named `SparkEntry.queries` entries to `<outDir>/<query>_<tag>.txt`,
  * under the SAME session shape the bench runs (local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cpus, AQE on) so the captured plan is the plan
  * the bench actually executes. Optionally times each query with the
  * noop sink (guide §1.4 — computes every column, discards the write)
  * so a plan file and an isolated computation time come from one run.
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <tag> <regex> [sfDir] [reps]"`
  *   tag    suffix for the plan files, e.g. `before` / `after`
  *   regex  which queries to dump (same semantics as SPARK_GRAFT_ONLY)
  *   sfDir  fixture dir (default /root/testdata/sf0.1)
  *   reps   noop-timed reps per query (default 3; 0 = plans only)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val re = args(1).r
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_plandump_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.silenceSidecarPathNoise()
    val outDir = Paths.get("plans/r19")
    Files.createDirectories(outDir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => re.findFirstIn(n).isDefined }
      .foreach { case (name, fn) =>
        try {
          spark.sparkContext.setJobDescription(s"plandump:$name")
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(FormattedMode)
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val timing =
            if (times.isEmpty) ""
            else {
              val s = times.sorted
              val med = s(s.size / 2)
              f"== Noop-sink timing (reps=$reps, sf=$sfDir) ==%n" +
                times.map(t => f"$t%.3f").mkString("runs: ", ", ", " s") +
                f"%nmedian: $med%.3f s%n%n"
            }
          Files.writeString(outDir.resolve(s"${name}_$tag.txt"), timing + plan)
          println(f"[plandump] $name -> plans/r19/${name}_$tag.txt")
          spark.catalog.clearCache()
          System.gc()
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
