package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

class SimHashExpressionSpec extends SparkSpec {

  test("native simhash64 is bit-identical to the 64-aggregate builtin composition") {
    val docs = table("documents").limit(100)
    val both = docs.select(
      Dedup.simhash64(col("text")).as("native"),
      Dedup.simhash64Builtin(col("text")).as("builtin")
    )
    assert(both.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("simhash64 registered as SQL function graft_simhash64") {
    SimHash64Expression.register(spark)
    table("documents").limit(5).createOrReplaceTempView("docs_tmp")
    val viaSql = spark.sql(
      "SELECT graft_simhash64(split(trim(lower(text)), '\\\\s+')) AS h FROM docs_tmp")
    val viaCol = table("documents").limit(5).select(Dedup.simhash64(col("text")).as("h"))
    assert(viaSql.collect().map(_.getLong(0)).sorted.toSeq ===
      viaCol.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("native minhash64: k slots, identical for identical input, monotone under similarity") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),      // identical
      (3L, "the quick brown fox jumps over the sleepy dog"),    // near
      (4L, "completely different words entirely here now folks")
    ).toDF("id", "text")
    val sigs = df.select(col("id"),
      MinHash64Expression.minhash64(Dedup.shingles(col("text"), 2), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length === 32)
    assert(sigs(1L) === sigs(2L))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(1L), sigs(3L)) > agree(sigs(1L), sigs(4L)))
  }

  test("shinglehash64 equals xxhash64 over the string shingle form") {
    val docs = table("documents").limit(100)
    val both = docs.select(
      Dedup.shingleHashes(col("text"), 3).as("fast"),
      transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("viaStrings")
    )
    assert(both.filter(col("fast") =!= col("viaStrings")).count() === 0)
  }

  test("minshingle equals array_min over the string shingle form") {
    val docs = table("documents").limit(100)
    val both = docs.select(
      MinShingleExpression.minShingle(
        split(trim(lower(col("text"))), "\\s+"), 3).as("fast"),
      array_min(Dedup.shingles(col("text"), 3)).as("viaArray")
    )
    assert(both.filter(col("fast") =!= col("viaArray")).count() === 0)
  }

  test("minhash64 from hashed shingles is bit-identical to the string path") {
    val docs = table("documents").limit(100)
    val both = docs.select(
      MinHash64Expression.minhash64(Dedup.shingleHashes(col("text"), 3), 32).as("viaHash"),
      MinHash64Expression.minhash64(Dedup.shingles(col("text"), 3), 32).as("viaStr")
    )
    assert(both.filter(col("viaHash") =!= col("viaStr")).count() === 0)
  }

  test("jaccardLong kernel equals the set-op composition, including duplicates") {
    import spark.implicits._
    val fixture = table("documents").limit(100)
      .select(Dedup.shingleHashes(col("text"), 3).as("a"),
        Dedup.shingleHashes(reverse(col("text")), 3).as("b"))
    val synthetic = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(2L, 2L, 3L)),  // duplicates collapse as sets
      (Seq.empty[Long], Seq.empty[Long]),  // 0/0 -> 0.0
      (Seq(5L), Seq.empty[Long]),
      (Seq(7L, 8L), Seq(7L, 8L))
    ).toDF("a", "b")
    for (df <- Seq(fixture, synthetic)) {
      val bad = df.select(
        Dedup.jaccardLong(col("a"), col("b")).as("fast"),
        Dedup.jaccard(col("a"), col("b")).as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(bad.count() === 0, bad.limit(3).collect().mkString("; "))
    }
  }

  test("shinglehash64 and minshingle registered as SQL functions") {
    ShingleHash64Expression.register(spark)
    MinShingleExpression.register(spark)
    table("documents").limit(5).createOrReplaceTempView("docs_tmp2")
    val viaSql = spark.sql(
      "SELECT size(graft_shinglehash64(split(trim(lower(text)), '\\\\s+'), 3)) AS n, " +
        "graft_minshingle(split(trim(lower(text)), '\\\\s+'), 3) AS m FROM docs_tmp2")
      .collect()
    assert(viaSql.length === 5)
    viaSql.foreach { r => assert(r.getInt(0) > 0); assert(r.getString(1).nonEmpty) }
  }

  test("shingle kernels agree with the string form on edge cases") {
    import spark.implicits._
    val edge = Seq(
      "",                       // empty text
      "   ",                    // whitespace only
      "one",                    // fewer tokens than n
      "one two",                // exactly n-1
      "one two three",          // exactly n
      "a a a a a",              // repeated token (dedup path)
      "日本語 テキスト の 例 です", // non-ASCII tokens
      "x " * 500                // long repetitive text
    ).zipWithIndex.map(_.swap).toDF("id", "text")
    val both = edge.select(
      col("id"),
      Dedup.shingleHashes(col("text"), 3).as("fast"),
      transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("slow"),
      MinShingleExpression.minShingle(
        split(trim(lower(col("text"))), "\\s+"), 3).as("minFast"),
      array_min(Dedup.shingles(col("text"), 3)).as("minSlow"))
    assert(both.filter(col("fast") =!= col("slow")).count() === 0)
    assert(both.filter(col("minFast") =!= col("minSlow")).count() === 0)
  }

  test("expressions survive whole-stage codegen (no fallback errors at scale)") {
    // exercise the doGenCode path over the whole fixture
    val n = table("documents")
      .select(Dedup.simhash64(col("text")).as("s"),
        MinHash64Expression.minhash64(Dedup.shingles(col("text"), 3), 16).as("m"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(col("s") =!= 0L && size(col("m")) === 16 && size(col("sh")) > 0)
      .count()
    assert(n === table("documents").count())
  }

  test("kr-hash kernels register for SQL use") {
    KrHashExpression.register(spark)
    KrShingleHashExpression.register(spark)
    import spark.implicits._
    Seq(("Hello World", Seq("a", "b", "c", "d"))).toDF("t", "toks")
      .createOrReplaceTempView("kr_t")
    val r = spark.sql(
      "SELECT graft_kr_hash(t) AS h, graft_kr_shingle_hash(toks, 3) AS sh FROM kr_t")
      .collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getSeq[Long](1).length === 2) // 4 tokens, n=3 -> 2 shingles
  }
}
