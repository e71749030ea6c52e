package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.Dedup

/** Property tests: the native shingle kernels must agree with their
  * built-in-composition references on arbitrary text — generated token
  * soups with random whitespace runs, unicode tokens, punctuation, and
  * degenerate shapes. All samples are checked in ONE Spark job per
  * kernel (a generated-text column), not one job per sample.
  */
class ShingleKernelPropertySpec extends SparkSpec {

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("日本語", "テキスト", "мир", "héllo", "a.b,c!", "x'y", "--", "_"),
    Gen.const(""),
    Gen.numStr.map(_.take(4))
  )

  private val whitespace: Gen[String] =
    Gen.oneOf(" ", "  ", "\t", " \t ", "\n", "   ")

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, token)
    seps <- Gen.listOfN(math.max(n - 1, 0), whitespace)
    lead <- Gen.oneOf("", " ", "\t")
    trail <- Gen.oneOf("", " ", "\n")
  } yield lead + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString + trail

  private def samples(count: Int): Seq[String] = {
    val params = Gen.Parameters.default
    (0 until count).flatMap(i => text.apply(params, rng.Seed(i.toLong)))
  }

  test("shinglehash64 == xxhash64∘string-shingles on 300 generated texts") {
    import spark.implicits._
    val df = samples(300).zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = df.select(
        col("id"),
        Dedup.shingleHashes(col("text"), n).as("fast"),
        transform(Dedup.shingles(col("text"), n), s => xxhash64(s)).as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(bad.count() === 0,
        s"n=$n mismatches: ${bad.limit(3).collect().mkString("; ")}")
    }
  }

  test("minshingle == array_min∘string-shingles on 300 generated texts") {
    import spark.implicits._
    val df = samples(300).zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 3)) {
      val bad = df.select(
        col("id"),
        MinShingleExpression.minShingle(
          split(trim(lower(col("text"))), "\\s+"), n).as("fast"),
        array_min(Dedup.shingles(col("text"), n)).as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(bad.count() === 0,
        s"n=$n mismatches: ${bad.limit(3).collect().mkString("; ")}")
    }
  }

  test("foldToken matches a per-codepoint reference fold on generated tokens") {
    val P = 1000000007L
    def ref(acc0: Long, s: String): Long = {
      var acc = acc0
      s.codePoints().toArray.foreach { cp =>
        val lo = Character.toLowerCase(cp)
        if ((lo >= 'a' && lo <= 'z') || (lo >= '0' && lo <= '9') || lo == ' ')
          acc = (acc * 31L + lo) % P
      }
      acc
    }
    val toks: Seq[String] =
      samples(200) ++ Seq("ABC def", "𝔘nicode 𝒜", "ÅÉÎß", "", null)
    toks.foreach { t =>
      val u =
        if (t == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val expected = if (t == null) 7L else ref(7L, t)
      assert(KrShingleHashExpression.foldToken(7L, u) === expected, s"token=$t")
    }
  }

  test("minhash64 hashed-vs-string paths agree on 300 generated texts") {
    import spark.implicits._
    val df = samples(300).zipWithIndex.map(_.swap).toDF("id", "text")
    val bad = df.select(
      MinHash64Expression.minhash64(Dedup.shingleHashes(col("text"), 3), 16).as("h"),
      MinHash64Expression.minhash64(Dedup.shingles(col("text"), 3), 16).as("s"))
      .filter(col("h") =!= col("s"))
    assert(bad.count() === 0)
  }
}
