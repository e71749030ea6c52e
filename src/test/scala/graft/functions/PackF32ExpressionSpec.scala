package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.sinks.ArrayCarrier

class PackF32ExpressionSpec extends SparkSpec {

  test("pack/unpack round-trips bit-exactly, including NaN payloads and infinities") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, -2.5f, 0.0f)),
      (2L, Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)),
      (3L, Seq(Float.MinPositiveValue, -0.0f, 3.4e38f)),
      (4L, Seq.empty[Float])
    ).toDF("id", "v")
    val back = vecs.select(col("id"),
      UnpackF32Expression.unpackF32(PackF32Expression.packF32(col("v"))).as("v"))
    // compare raw bits: NaN != NaN under float equality, but the
    // carrier's guarantee is BYTE exactness, not numeric equality
    def bits(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), transform(col("v"), f => {
        // float_bits via cast through the packed form per element
        f
      }))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits).toList)).toMap
    assert(bits(back) === bits(vecs))
  }

  test("packed layout is pinned little-endian float32") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1.0f))).toDF("v")
    val bytes = df.select(PackF32Expression.packF32(col("v")))
      .collect()(0).getAs[Array[Byte]](0)
    // 1.0f = 0x3F800000 → LE bytes 00 00 80 3F
    assert(bytes.toSeq === Seq[Byte](0, 0, -128, 0x3f))
  }

  test("unpack rejects a payload that is not whole float32s") {
    import spark.implicits._
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
    val e = intercept[Exception] {
      bad.select(UnpackF32Expression.unpackF32(col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("ArrayCarrier pack/unpack: suffix convention survives case-folding engines") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.5f, 2.5f), "x")).toDF("id", "embedding", "tag")
    val packed = ArrayCarrier.pack(df)
    assert(packed.columns.toSeq === Seq("id", "embedding__arr_f32le", "tag"))
    assert(packed.schema("embedding__arr_f32le").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // a case-folding engine hands the carrier back uppercased: unpack
    // must still recognize the suffix and strip exactly its length
    val folded = packed.select(packed.columns.map(c =>
      col(c).as(c.toUpperCase(java.util.Locale.ROOT))): _*)
    val un = ArrayCarrier.unpack(folded)
    assert(un.columns.toSeq === Seq("ID", "EMBEDDING", "TAG"))
    assert(un.select("EMBEDDING").collect()(0).getSeq[Float](0) === Seq(1.5f, 2.5f))
    // non-carrier frames pass through unchanged
    assert(ArrayCarrier.unpack(df).columns.toSeq === df.columns.toSeq)
    assert(!ArrayCarrier.needed(un.select("ID", "TAG")))
    assert(ArrayCarrier.needed(df))
  }

  test("ArrayCarrier refuses a non-binary column squatting on the suffix") {
    import spark.implicits._
    val df = Seq(Tuple1("not a vector")).toDF("c__arr_f32le")
    val e = intercept[IllegalArgumentException](ArrayCarrier.pack(df))
    assert(e.getMessage.contains("__arr_f32le"))
  }

  test("portableChecksum fingerprints array<float> and catches a one-bit flip") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f))).toDF("id", "v")
    val b = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0000005f))).toDF("id", "v")
    val ca = graft.verify.Comparator.portableChecksum(a).collect()(0).toString
    val cb = graft.verify.Comparator.portableChecksum(b).collect()(0).toString
    val ca2 = graft.verify.Comparator.portableChecksum(a).collect()(0).toString
    assert(ca === ca2)
    assert(ca !== cb, "a ULP-level flip must move the vector checksum")
  }
}
