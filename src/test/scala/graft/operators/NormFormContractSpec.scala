package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The normalization-form stamp ([[NormForm]]): every text-index
  * family refuses a mismatched-form probe/append with a NAMED error
  * instead of silently never matching (the r18 documented-but-silent
  * caller contract, now enforced); pre-stamp surfaces stay accepted
  * (the documented warn path); the stamp survives restamps and the
  * curated-ingest stream surfaces the refusal at micro-batch one.
  */
class NormFormContractSpec extends SparkSpec {

  import graft.operators.{Corpus, Dedup, TextAnalysis}

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(d => (8800000L + d,
      s"n${d}a n${d}b n${d}c n${d}d n${d}e n${d}f"))
      .toDF("doc_id", "text")
  }

  private def named(e: Throwable, stored: String, passed: String): Unit = {
    assert(e.getMessage.contains(s"'$stored'") &&
      e.getMessage.contains(s"normForm='$passed'"),
      s"the refusal must name both forms: ${e.getMessage}")
  }

  test("minhash: an NFC-built index refuses an NFKC_FOLD probe and append NAMED; the matching form passes") {
    val d = docs(6)
    spark.sql("DROP TABLE IF EXISTS nfc_mh")
    Dedup.writeMinhashIndex(d, "doc_id", "text", "nfc_mh", buckets = 4,
      normForm = "NFC")
    val probe = intercept[IllegalArgumentException] {
      Dedup.portableMinhashPairsAgainstIndex(spark, "nfc_mh", d,
        "doc_id", "text", normForm = "NFKC_FOLD").count()
    }
    named(probe, "NFC", "NFKC_FOLD")
    val app = intercept[IllegalArgumentException] {
      Dedup.appendToMinhashIndex(spark, "nfc_mh", docs(2), "doc_id", "text",
        normForm = "NONE")
    }
    named(app, "NFC", "NONE")
    // the matching form probes and appends normally — and NONE is a
    // VALUE, not an absence: the stamped default refuses a formed probe
    assert(Dedup.portableMinhashPairsAgainstIndex(spark, "nfc_mh", d,
      "doc_id", "text", normForm = "NFC").count() === 6L)
    Dedup.appendToMinhashIndex(spark, "nfc_mh", docs(2), "doc_id", "text",
      normForm = "NFC")
    spark.sql("DROP TABLE IF EXISTS none_mh")
    Dedup.writeMinhashIndex(d, "doc_id", "text", "none_mh", buckets = 4)
    val defRefuse = intercept[IllegalArgumentException] {
      Dedup.portableMinhashPairsAgainstIndex(spark, "none_mh", d,
        "doc_id", "text", normForm = "NFKC_FOLD").count()
    }
    named(defRefuse, "NONE", "NFKC_FOLD")
  }

  test("minhash: a pre-stamp index (no graft_norm_form metadata) is accepted as-is — the documented warn path") {
    val d = docs(5)
    // replicate the pre-r19 write inline: shingle stamp only
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft_minhash_n", 3L).build()
    val sig = Dedup.portableMinhashSignatures(d, "doc_id", "text", 3, 8)
      .withColumnRenamed("doc_id", "index_id")
      .withColumn("sig_0", col("sig_0").as("sig_0", meta))
    spark.sql("DROP TABLE IF EXISTS legacy_mh")
    graft.plans.ScaleJoins.writeBucketed(sig, "legacy_mh", "sig_0", 4)
    // any form passes — there is nothing to compare against
    assert(Dedup.portableMinhashPairsAgainstIndex(spark, "legacy_mh", d,
      "doc_id", "text", normForm = "NFKC_FOLD").count() === 5L)
    Dedup.appendToMinhashIndex(spark, "legacy_mh", docs(2), "doc_id", "text",
      normForm = "NFC")
  }

  test("bloom: stamp enforced on probe and append; a pre-stamp _stats row is accepted; sweep rebuild preserves the stamp") {
    import spark.implicits._
    val d = docs(8)
    Corpus.writeBloomIndex(d, "text", "nfc_bloom", n = 2, normForm = "NFC")
    val probe = intercept[IllegalArgumentException] {
      Corpus.bloomDecontaminationFromIndex(d, "doc_id", "text", "nfc_bloom",
        normForm = "NFKC_FOLD").count()
    }
    named(probe, "NFC", "NFKC_FOLD")
    val app = intercept[IllegalArgumentException] {
      Corpus.appendToBloomIndex("nfc_bloom", docs(2), "text")
    }
    named(app, "NFC", "NONE")
    assert(Corpus.bloomDecontaminationFromIndex(d, "doc_id", "text",
      "nfc_bloom", normForm = "NFC").filter(col("flagged")).count() === 8L)
    // legacy: strip the stamp column the way a pre-r19 _stats row looks
    Seq((1 << 18, 5, 2)).toDF("m_bits", "k_hashes", "shingle_n")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("nfc_bloom_stats")
    assert(Corpus.bloomIndexNormForm(spark, "nfc_bloom") === None)
    assert(Corpus.bloomDecontaminationFromIndex(d, "doc_id", "text",
      "nfc_bloom", normForm = "NFKC_FOLD").count() === 8L,
      "a pre-stamp bloom accepts any declared form")
    // a roster sweep rebuild re-applies AND re-stamps the stored form.
    // TEETH: the live parquet stores the DECOMPOSED spelling — if the
    // rebuild skipped the stored NFC pass, its bits would be
    // decomposed shingles and the composed probe below would read
    // clean; if it forgot the stamp, the probe would refuse.
    def cps(c: Int) = new String(Character.toChars(c))
    val deco = "cafe" + cps(0x301) // e + combining acute
    val comp = "caf" + cps(0xE9)   // é composed — NFC(deco)
    // ids in this suite's own 8.8e6 range: the sweep's strict
    // discovery scan probes EVERY catalog index table for the swept
    // ids, and small ids would collide with other suites' fixtures
    val live = Seq((8800201L, s"$deco one two three"),
      (8800202L, "unrelated words entirely elsewhere"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_nf_live").toString
    live.write.mode("overwrite").parquet(dir)
    val reg = "nf_reg"
    graft.verify.Takedown.registerCorpus(spark, "nfsw", dir, "doc_id", reg)
    graft.verify.Takedown.writeBloomIndex(spark, "nfsw",
      live.select(col("doc_id"),
        Corpus.normalizeText(col("text"), "NFC").as("text")),
      "text", "nfsw_bloom", provenance = "roster", n = 2, normForm = "NFC",
      registryTable = reg)
    // the sweep matches doc 2 → the roster bloom REBUILDS from the
    // post-delete live dir (raw decomposed text + the stored NFC form)
    graft.verify.Takedown.sweep(spark, "nfsw", col("doc_id") === 8800202L,
      registryTable = reg)
    assert(Corpus.bloomIndexNormForm(spark, "nfsw_bloom") === Some("NFC"),
      "the sweep's roster rebuild must re-stamp the stored form")
    val f = Corpus.bloomDecontaminationFromIndex(
      Seq((9L, s"$comp one two three")).toDF("doc_id", "text"),
      "doc_id", "text", "nfsw_bloom", normForm = "NFC")
    assert(f.head().getBoolean(2),
      "the rebuilt roster must match the composed probe — i.e. the " +
        "rebuild re-applied NFC to the raw decomposed live text")
    val gone = Corpus.bloomDecontaminationFromIndex(
      Seq((8L, "unrelated words entirely elsewhere")).toDF("doc_id", "text"),
      "doc_id", "text", "nfsw_bloom", normForm = "NFC")
    assert(!gone.head().getBoolean(2),
      "the swept doc's shingles left the rebuilt roster")
  }

  test("bm25: stamp enforced on append and the incremental cosine; restamp preserves it; pre-stamp stays 4-column") {
    val d = docs(6)
    spark.sql("DROP TABLE IF EXISTS nfc_bm")
    TextAnalysis.writeBm25Index(d, "doc_id", "text", "nfc_bm", buckets = 4,
      normForm = "NFC")
    val app = intercept[IllegalArgumentException] {
      TextAnalysis.appendToBm25Index(spark, "nfc_bm", docs(2), "doc_id",
        "text", normForm = "NFKC_FOLD")
    }
    named(app, "NFC", "NFKC_FOLD")
    TextAnalysis.refreshCosineNorms(spark, "nfc_bm")
    val cos = intercept[IllegalArgumentException] {
      TextAnalysis.lexicalCosineAgainstIndex(spark, "nfc_bm", docs(1),
        "doc_id", "text").count()
    }
    named(cos, "NFC", "NONE")
    // restamp rewrites the stats row — the stamp must ride along
    TextAnalysis.restampBm25Index(spark, "nfc_bm")
    val still = intercept[IllegalArgumentException] {
      TextAnalysis.appendToBm25Index(spark, "nfc_bm", docs(2), "doc_id",
        "text", normForm = "NONE")
    }
    named(still, "NFC", "NONE")
    TextAnalysis.appendToBm25Index(spark, "nfc_bm", docs(2), "doc_id",
      "text", normForm = "NFC")
    // pre-stamp shape: a 4-column stats row accepts any form and the
    // restamp must NOT invent a stamp for it
    import spark.implicits._
    Seq((6L, 36L, 6L, 36L))
      .toDF("n_docs", "sum_dl", "built_docs", "built_sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable("nfc_bm_stats")
    TextAnalysis.appendToBm25Index(spark, "nfc_bm", docs(1), "doc_id",
      "text", normForm = "NFKC_FOLD")
    TextAnalysis.restampBm25Index(spark, "nfc_bm")
    assert(!spark.table("nfc_bm_stats").columns.contains("norm_form"),
      "restamping a pre-stamp index must preserve its 4-column shape")
  }

  test("curated ingest: a mismatched stream form surfaces the NAMED refusal at micro-batch one, not zero matches") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS nfs_mh")
    Dedup.writeMinhashIndex(docs(2), "doc_id", "text", "nfs_mh", buckets = 4,
      normForm = "NFC")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_nfs_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_nfs_out").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nfs_ck").toString
    docs(3).write.mode("overwrite").parquet(srcDir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      graft.streaming.CorpusIngest.startCuratedIngest(
        spark.readStream.schema(spark.read.parquet(srcDir).schema)
          .parquet(srcDir),
        outDir, ckpt, "nfs_mh", normalizeForm = Some("NFKC_FOLD"))
        .awaitTermination(180000)
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("'NFC'") &&
      m.contains("normForm='NFKC_FOLD'")),
      s"the stream must surface the named refusal: ${causes(e).mkString(" | ")}")
  }
}
