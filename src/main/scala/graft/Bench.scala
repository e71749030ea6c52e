package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run a representative mix (scan+agg, join, window, text)
    // untimed so JVM/JIT/codegen/parquet-footer warm-up isn't billed to
    // whichever queries happen to run first.
    Seq("q_a5_group_agg", "q_j1_left_outer", "q_w1_row_number", "q_text_tokens")
      .foreach { w =>
        try SparkEntry.queries.get(w).foreach(_(spark, sfDir).count())
        catch { case _: Throwable => () }
      }
    // deterministic order → per-query numbers comparable across rounds;
    // each query timed `reps` times, min reported — single-shot numbers
    // swung ±50% run-to-run on the shuffle-heavy dedup queries
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // a rep that throws is recorded as a FAILURE, not a (fast) time —
    // otherwise a regression that breaks a query reads as a speedup.
    // min is taken over successful reps only; a query with zero
    // successful reps reports -1 and lands in "failed".
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // The driver captures only the tail of stdout, so the JSON line must
    // stay short enough to survive intact (r3's 9-decimal line for 69
    // queries was truncated → "parsed": null). 3-decimal times keep the
    // full map ~2.4 KB; if the query set grows past the budget, keep the
    // slowest entries (the ones worth comparing) and count the rest.
    // The driver keeps a 2000-char tail and sbt appends its own
    // "[success] Total time: …" line (~75 chars) after ours, so the
    // WHOLE JSON line must stay under ~1900 chars — r1–r3 all came back
    // "parsed": null because the line's head fell off the tail window.
    // ~130 chars of fixed fields ⇒ cap the queries map at 1500.
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val lineBudget = 1500
    val byTime = results.sortBy(-_._2)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var sz = 2
    byTime.foreach { case (k, v) =>
      val entrySz = k.length + fmt(v).length + 4
      if (sz + entrySz <= lineBudget) { kept += ((k, v)); sz += entrySz }
    }
    val qs = kept.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val omitted = results.size - kept.size
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"omitted":$omitted,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
