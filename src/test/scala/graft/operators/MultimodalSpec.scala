package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** documents.text cast to binary stands in for media payloads. */
  private lazy val media = table("documents")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("asMedia attaches typed metadata with byte length") {
    val out = Multimodal.asMedia(media, "payload")
    val r = out.filter(col("doc_id") === 0)
      .select(col("media_meta.n_bytes"), col("media_meta.format")).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.isNullAt(1)) // format unknown until decode
  }

  test("decodeFeatures: partition-parallel decode with stable schema and determinism") {
    val out = Multimodal.decodeFeatures(media, "doc_id", "payload")
    assert(out.columns.toSeq ===
      Seq("doc_id", "format", "width", "height", "n_bytes", "features"))
    val rows1 = out.orderBy("doc_id").limit(5).collect()
    val rows2 = Multimodal.decodeFeatures(media, "doc_id", "payload")
      .orderBy("doc_id").limit(5).collect()
    assert(rows1.map(_.toString).toSeq === rows2.map(_.toString).toSeq)
    rows1.foreach { r =>
      assert(r.getAs[Seq[Float]]("features").length === Multimodal.DecoderStub.featureDim)
      assert(Set("png", "jpg").contains(r.getAs[String]("format")))
      assert(r.getAs[Long]("n_bytes") > 0)
    }
    assert(out.count() === media.count())
  }

  test("sampleFrames emits n windows per payload") {
    val out = Multimodal.sampleFrames(media.limit(10), "doc_id", "payload", n = 4)
    assert(out.count() === 40)
    val idx = out.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted
    assert(idx.toSeq === Seq(0, 1, 2, 3))
  }

  test("resize keeps one row per payload with the target dimensions") {
    val out = Multimodal.resize(media.limit(10), "doc_id", "payload", 224, 224)
    assert(out.columns.toSeq === Seq("doc_id", "payload", "width", "height"))
    assert(out.count() === 10)
    out.collect().foreach { r =>
      assert(r.getAs[Int]("width") === 224 && r.getAs[Int]("height") === 224)
      assert(r.getAs[Array[Byte]]("payload") != null)
    }
  }
}
