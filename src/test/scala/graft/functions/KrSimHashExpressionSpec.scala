package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Unit coverage for the portable one-pass SimHash kernel — mirrors
  * SimHashExpressionSpec: interpreted-vs-codegen parity, degenerate
  * inputs, analysis-time parameter validation, and a cross-check
  * against an independent aggregate() formulation of the same
  * mix-then-vote arithmetic.
  */
class KrSimHashExpressionSpec extends SparkSpec {

  test("krSimHash equals the aggregate() HOF formulation of mix-then-vote") {
    // independent recomputation: per-token KR hash via the 1-shingle
    // kernel, Knuth mix, per-bit +/-1 vote composed from built-ins —
    // interpreted, slow, and structurally unlike the native one-pass
    // kernel, so agreement is real evidence
    val bits = 16
    val toks = split(trim(lower(col("text"))), "\\s+")
    val hashes = transform(
      KrShingleHashExpression.krShingleHash(toks, 1),
      h => (h * lit(KrSimHashExpression.MixMultiplier)) % lit(KrSimHashExpression.MixModulus))
    val viaAgg = (0 until bits).map { bit =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(s > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = table("documents").limit(100).select(
      KrSimHashExpression.krSimHash(toks, bits).as("native"),
      viaAgg.as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val tokens = new GenericArrayData(Array[Any](
      UTF8String.fromString("the"), UTF8String.fromString("Quick!"),
      null, UTF8String.fromString("")))
    // the static kernel IS the codegen body (doGenCode emits a call to
    // compute), so kernel-vs-column agreement covers both paths; the
    // column evaluation below runs through whole-stage codegen
    val direct = KrSimHashExpression.compute(tokens, 20)
    import spark.implicits._
    val viaCol = Seq(Seq[String]("the", "Quick!", null, "")).toDF("t")
      .select(KrSimHashExpression.krSimHash(col("t"), 20)).collect()(0).getLong(0)
    assert(direct === viaCol)
  }

  test("degenerate inputs: empty array votes every bit to 0; null array -> null") {
    import spark.implicits._
    val out = Seq((1L, Seq.empty[String]), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "t")
      .select(col("id"), KrSimHashExpression.krSimHash(col("t"), 28).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) === Some(0L)) // zero tokens -> all counters 0 -> no bit set
    assert(out(2L) === None) // null propagates (doc drops out of pairing)
  }

  test("null token hashes as the empty string, same as the 1-shingle kernel") {
    import spark.implicits._
    val both = Seq((Seq[String]("alpha", null, "beta"), Seq[String]("alpha", "", "beta")))
      .toDF("a", "b")
      .select(
        KrSimHashExpression.krSimHash(col("a"), 24).as("withNull"),
        KrSimHashExpression.krSimHash(col("b"), 24).as("withEmpty"))
      .collect()(0)
    assert(both.getLong(0) === both.getLong(1))
  }

  test("bits outside [1,30] fails at analysis time, not per-row") {
    import spark.implicits._
    val df = Seq(Seq("a", "b")).toDF("t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(KrSimHashExpression.krSimHash(col("t"), 31)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_kr_simhash"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(KrSimHashExpression.krSimHash(col("t"), 0)).collect()
    }
  }

  test("de-bias mix leaves no stuck signature bits over the corpus") {
    // the regression this kernel exists to prevent: without the mix,
    // bits ~18-29 voted 0 for every document. Assert every bit of the
    // 28-bit signature takes both values across sf0.001 documents.
    val bits = 28
    val sigs = table("documents")
      .select(Dedup.portableSimhashSignature(col("text"), bits).as("s"))
      .collect().map(_.getLong(0))
    val ones = (0 until bits).map(b => sigs.count(s => ((s >> b) & 1L) == 1L))
    ones.zipWithIndex.foreach { case (c, b) =>
      assert(c > 0 && c < sigs.length,
        s"signature bit $b is stuck (${c}/${sigs.length} ones) — de-bias mix regressed")
    }
  }
}
