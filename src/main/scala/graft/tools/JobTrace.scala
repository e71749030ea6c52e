package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: run ONE `SparkEntry.queries` entry and
  * print every Spark job it launches — job id, call site of the first
  * stage, stage count, task count — so a lifecycle gate's fixed-cost
  * job anatomy (staged rewrites, sidecar writes, validation probes) is
  * visible and countable. The verdict-r19 item #5 instrument: "count
  * the staged-swap renames+fsyncs per gate, eliminate redundant
  * listing/validation passes".
  *
  * Usage: `sbt "runMain graft.tools.JobTrace <query> [sfDir] [execute] [reps]"`
  *   query    exact SparkEntry.queries key
  *   sfDir    fixture dir (default /root/testdata/sf0.1)
  *   execute  also noop-run the returned frame (default false: the
  *            build phase alone — lifecycle gates do their real work
  *            eagerly inside the entry fn)
  *   reps     bench-parity repetitions of the whole entry+execute
  *            (default 1). Each rep re-invokes the entry fn like a
  *            bench rep does; the job listing printed is the LAST
  *            rep's — i.e. warm-JVM anatomy, separating real per-rep
  *            work from first-call codegen/JIT noise.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val execute = args.length > 2 && args(2).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_jobtrace_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.silenceSidecarPathNoise()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val meta = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.headOption.map(_.name).getOrElse("?")
        val tasks = j.stageInfos.map(_.numTasks).sum
        meta.put(j.jobId, (System.nanoTime(), site, j.stageInfos.size, tasks))
        ()
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(meta.remove(j.jobId)).foreach { case (t0, site, st, tk) =>
          val sec = (System.nanoTime() - t0) / 1e9
          lines.add(f"job ${j.jobId}%3d  ${sec}%7.2fs  stages=$st  tasks=$tk%4d  $site")
        }
        ()
      }
    })
    val reps = if (args.length > 3) args(3).toInt else 1
    var buildSec = 0.0
    var repSec = 0.0
    (1 to reps).foreach { r =>
      if (r == reps) { Thread.sleep(500); lines.clear() }
      val tr0 = System.nanoTime()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      buildSec = (System.nanoTime() - t0) / 1e9
      if (execute) df.write.format("noop").mode("overwrite").save()
      repSec = (System.nanoTime() - tr0) / 1e9
      println(f"[jobtrace] rep $r: $repSec%.2f s (build $buildSec%.2f s)")
    }
    Thread.sleep(500) // listener bus is async
    import scala.jdk.CollectionConverters._
    println(s"== JobTrace $name (sf=$sfDir, execute=$execute, last of $reps reps) ==")
    lines.asScala.foreach(println)
    println(f"== ${lines.size} jobs, last rep $repSec%.2f s (build $buildSec%.2f s) ==")
    spark.stop()
  }
}
