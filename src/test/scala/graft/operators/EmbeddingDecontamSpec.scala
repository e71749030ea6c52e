package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingDecontamSpec extends SparkSpec {

  private def emb = table("embeddings")

  test("brute: planted copies flag exactly the benchmark sources") {
    val bench = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val out = Corpus.embeddingDecontaminationFlags(
      emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", bench, "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 500)
    out.foreach { case (id, nHits, flagged) =>
      if (id < 50) assert(flagged && nHits == 1L, s"source $id: hits=$nHits")
      else assert(!flagged && nHits == 0L, s"clean $id flagged with $nHits")
    }
  }

  test("brute: a doubled benchmark vector counts twice in n_hits") {
    val bench1 = emb.filter(col("vec_id") === 7).select(col("embedding"))
    val bench = bench1.unionAll(bench1)
    val out = Corpus.embeddingDecontaminationFlags(
      emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", bench, "embedding", threshold = 0.8)
      .filter(col("vec_id") === 7).head()
    assert(out.getLong(1) == 2L && out.getBoolean(2))
  }

  test("banded arm equals the brute arm on the fixture") {
    val bench = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val brute = Corpus.embeddingDecontaminationFlags(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.8)
      .orderBy("vec_id").collect().toSeq
    val banded = Corpus.embeddingDecontaminationBanded(
      corpus, "vec_id", "embedding", bench, "embedding",
      threshold = 0.8, nBits = 6, nBands = 6)
      .orderBy("vec_id").collect().toSeq
    assert(banded == brute)
  }

  test("empty benchmark: nothing is contaminated, in both arms") {
    val bench = emb.filter(col("vec_id") < 0).select(col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).limit(20)
    Seq(
      Corpus.embeddingDecontaminationFlags(
        corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.8),
      Corpus.embeddingDecontaminationBanded(
        corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.8)
    ).foreach { out =>
      val rows = out.collect()
      assert(rows.length == 20)
      assert(rows.forall(r => r.getLong(1) == 0L && !r.getBoolean(2)))
    }
  }

  test("banded: a multi-band collision still counts a benchmark vector once") {
    // the planted copy collides in EVERY band; n_hits must stay 1
    val bench = emb.filter(col("vec_id") === 3)
      .select(col("embedding"))
    val out = Corpus.embeddingDecontaminationBanded(
      emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", bench, "embedding",
      threshold = 0.8, nBits = 4, nBands = 8)
      .filter(col("vec_id") === 3).head()
    assert(out.getLong(1) == 1L, s"multi-band dup counted ${out.getLong(1)}×")
  }

  test("cosineJoin: planted cross-dataset copies pair exactly; no false positives") {
    val left = emb.filter(col("vec_id") < 300).select(col("vec_id"), col("embedding"))
    val right = emb.filter(col("vec_id") >= 40 && col("vec_id") < 80)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineJoin(left, "vec_id", "embedding",
      right, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (40L until 80L).map(i => (i, i + 1000000)).toSet)
  }

  test("cosineJoin: multi-band collisions emit one pair; empty right side emits nothing") {
    val one = emb.filter(col("vec_id") === 11).select(col("vec_id"), col("embedding"))
    val dup = one.select((col("vec_id") + 5000).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineJoin(one, "vec_id", "embedding",
      dup, "vec_id", "embedding", threshold = 0.9, nBits = 4, nBands = 8)
      .collect()
    assert(pairs.length == 1, s"multi-band copy emitted ${pairs.length} pairs")
    assert(Similarity.cosineJoin(one, "vec_id", "embedding",
      emb.filter(col("vec_id") < 0).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", threshold = 0.9).count() == 0L)
  }

  test("persisted band index: fromIndex equals the in-memory banded arm; appends gate at next read; compact preserves flags") {
    val bench = emb.filter(col("vec_id") < 50).select(col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    spark.sql("DROP TABLE IF EXISTS emb_band_idx")
    spark.sql("DROP TABLE IF EXISTS emb_band_idx_stats")
    Corpus.writeEmbeddingBandIndex(bench, "embedding", "emb_band_idx",
      nBits = 6, nBands = 6)
    val fromIdx = Corpus.embeddingDecontaminationFromIndex(
      corpus, "vec_id", "embedding", "emb_band_idx", threshold = 0.8)
      .orderBy("vec_id").collect().toSeq
    val inMem = Corpus.embeddingDecontaminationBanded(
      corpus, "vec_id", "embedding", bench, "embedding",
      threshold = 0.8, nBits = 6, nBands = 6)
      .orderBy("vec_id").collect().toSeq
    // distinct benchmark vectors → row-identity and content-identity
    // agree and the persisted arm must reproduce the in-memory arm
    assert(fromIdx == inMem)
    // a second suite appended under the STORED params gates ids 50..59
    Corpus.appendToEmbeddingBandIndex("emb_band_idx",
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
        .select(col("embedding")), "embedding")
    def flaggedIds(): Set[Long] = Corpus.embeddingDecontaminationFromIndex(
      corpus, "vec_id", "embedding", "emb_band_idx", threshold = 0.8)
      .filter(col("contaminated")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val afterAppend = flaggedIds()
    assert((50L until 60L).forall(afterAppend.contains),
      s"appended suite must gate: ${afterAppend.toSeq.sorted.take(70)}")
    assert(afterAppend.intersect((60L until 500L).toSet).isEmpty,
      "append must not create false positives")
    // a REPLAYED append writes the same rows again: flags unchanged,
    // duplicate ratio trips the staleness flag, compact reclaims it
    // through the staged swap, flags still unchanged
    Corpus.appendToEmbeddingBandIndex("emb_band_idx",
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
        .select(col("embedding")), "embedding")
    assert(flaggedIds() === afterAppend, "replay residue must not change flags")
    assert(Corpus.isStaleEmbeddingBandIndex(spark, "emb_band_idx", maxDupPpm = 100000L),
      "a full replayed append is well past 10% residue")
    val (before, after) = Corpus.compactEmbeddingBandIndex(spark, "emb_band_idx")
    assert(after < before, s"compact must reclaim rows ($before -> $after)")
    assert(!Corpus.isStaleEmbeddingBandIndex(spark, "emb_band_idx", maxDupPpm = 100000L))
    assert(flaggedIds() === afterAppend, "compaction must preserve flags")
    val st = Corpus.embeddingBandIndexStats(spark, "emb_band_idx").head()
    assert(st.getAs[Long]("dup_ppm") === 0L)
    assert(st.getAs[Long]("n_vectors") === 60L)
  }

  test("suite removal: deleting B from A∪B equals a fresh A-only build bit for bit; overlap re-appends; delete is idempotent") {
    val a = emb.filter(col("vec_id") < 40).select(col("embedding"))
    val b = emb.filter(col("vec_id") >= 40 && col("vec_id") < 70)
      .select(col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    Seq("emb_band_del", "emb_band_del_stats", "emb_band_ref",
      "emb_band_ref_stats").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Corpus.writeEmbeddingBandIndex(a, "embedding", "emb_band_del",
      nBits = 6, nBands = 6)
    Corpus.appendToEmbeddingBandIndex("emb_band_del", b, "embedding")
    val (nBefore, nAfter) =
      Corpus.deleteFromEmbeddingBandIndex(spark, "emb_band_del", b, "embedding")
    assert(nBefore > nAfter, s"the delete must remove B's rows ($nBefore -> $nAfter)")
    // delete == rebuild: STORED ROWS equal a fresh A-only index's, not
    // just the probe outputs — identities, vectors, norms, bands, sigs
    Corpus.writeEmbeddingBandIndex(a, "embedding", "emb_band_ref",
      nBits = 6, nBands = 6)
    def rows(t: String): Seq[String] = spark.table(t)
      .orderBy("__bid", "__band").collect().map(_.toString).toSeq
    assert(rows("emb_band_del") === rows("emb_band_ref"))
    // and the probes agree bit for bit
    def probe(t: String) = Corpus.embeddingDecontaminationFromIndex(
      corpus, "vec_id", "embedding", t, threshold = 0.8)
      .orderBy("vec_id").collect().toSeq
    assert(probe("emb_band_del") === probe("emb_band_ref"))
    // idempotent: re-deleting an already-removed suite is a no-op
    val (n2Before, n2After) =
      Corpus.deleteFromEmbeddingBandIndex(spark, "emb_band_del", b, "embedding")
    assert(n2Before === n2After)
    assert(rows("emb_band_del") === rows("emb_band_ref"))
    // content-identity contract: a vector SHARED between the removed and
    // a retained suite goes too — and the documented remedy (re-append
    // the retained suite, replay-idempotent) restores exact equality
    val shared = emb.filter(col("vec_id") === 5).select(col("embedding"))
    val bPlusShared = b.unionByName(shared)
    Corpus.deleteFromEmbeddingBandIndex(spark, "emb_band_del", bPlusShared, "embedding")
    assert(rows("emb_band_del") !== rows("emb_band_ref"),
      "the shared vector must have been removed by content identity")
    Corpus.appendToEmbeddingBandIndex("emb_band_del", a, "embedding")
    Corpus.compactEmbeddingBandIndex(spark, "emb_band_del")
    assert(rows("emb_band_del") === rows("emb_band_ref"),
      "re-appending the retained suite restores the exact A-only index")
  }

  test("persisted band index probe plan: no cartesian, the (band,sig) equi-key carries the join") {
    val bench = emb.filter(col("vec_id") < 20).select(col("embedding"))
    spark.sql("DROP TABLE IF EXISTS emb_band_plan_idx")
    spark.sql("DROP TABLE IF EXISTS emb_band_plan_idx_stats")
    Corpus.writeEmbeddingBandIndex(bench, "embedding", "emb_band_plan_idx")
    val plan = Corpus.embeddingDecontaminationFromIndex(
      emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", "emb_band_plan_idx", threshold = 0.8)
      .queryExecution.executedPlan.toString
    // the exact-cosine verify must ride the equi-join as a post-filter,
    // never degrade the join itself to a cartesian/BNLJ — that is the
    // both-sides-big contract the banded arm exists for
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("guards: threshold and band ranges") {
    val bench = emb.limit(1).select(col("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    intercept[IllegalArgumentException](Corpus.embeddingDecontaminationFlags(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.0))
    intercept[IllegalArgumentException](Corpus.embeddingDecontaminationBanded(
      corpus, "vec_id", "embedding", bench, "embedding",
      threshold = 0.8, nBits = 33, nBands = 2))
  }
}
