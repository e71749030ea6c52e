package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property tests for the operators whose correctness arguments are
  * subtle: connected components against a driver-side union-find,
  * bounded top-k against an in-memory reference, and the fused
  * Karp–Rabin shingle kernel against its HOF composition on adversarial
  * unicode (including codepoints whose lowercase folds INTO the kept
  * ASCII alphabet, e.g. the Kelvin sign and dotted capital I).
  */
class OperatorPropertySpec extends SparkSpec {

  private def params = Gen.Parameters.default

  test("duplicateClusters == union-find on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    (0 until 6).foreach { seed =>
      val edges = edgeGen.apply(params, rng.Seed(seed.toLong)).get
      val got = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: driver-side union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node of the component
      val expected = nodes.map { v =>
        val root = find(v)
        v -> nodes.filter(find(_) == root).min
      }.toMap
      assert(got === expected, s"seed=$seed edges=$edges")
    }
  }

  test("topKPerKey == in-memory sort-take on random scores") {
    import spark.implicits._
    val rowGen = for {
      key <- Gen.choose(1L, 8L)
      nbr <- Gen.choose(1L, 500L)
      score <- Gen.choose(-1000, 1000).map(_ / 1000.0)
    } yield (key, nbr, score)
    val rows = (0 until 2000)
      .flatMap(i => rowGen.apply(params, rng.Seed(i.toLong)))
      .distinct
    val df = rows.toDF("query_id", "neighbor_id", "cosine")
    for (k <- Seq(1, 3, 10)) {
      val got = Similarity.topKPerKey(df, "query_id", k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (key, grp) =>
        grp.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex.map {
          case ((_, nbr, sc), i) => (key, i + 1, nbr, sc)
        }
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq === expected, s"k=$k")
    }
  }

  test("kr-shingle kernel == composition on adversarial unicode texts") {
    import spark.implicits._
    val token: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Kelvin", "İstanbul", "straße", "日本語",
        "a.b,c!", "", "123", "UPPER", "MiXeD"),
      Gen.numStr.map(_.take(4)))
    val text: Gen[String] = for {
      n <- Gen.choose(0, 30)
      toks <- Gen.listOfN(n, token)
    } yield toks.mkString(" ")
    val docs = (0 until 200)
      .flatMap(i => text.apply(params, rng.Seed(1000L + i)))
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val w = TextAnalysis.tokens(lower(col("text")))
    for (n <- Seq(1, 3)) {
      val composed = when(size(w) < n, array(concat_ws(" ", w)))
        .otherwise(transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
      val bad = docs.select(
        col("id"),
        graft.functions.KrShingleHashExpression.krShingleHash(w, n).as("fast"),
        transform(composed, s => graft.operators.TextAnalysis.rollingHashBuiltin(s)).as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(bad.count() === 0,
        s"n=$n mismatches: ${bad.limit(3).collect().mkString("; ")}")
    }
  }
}
