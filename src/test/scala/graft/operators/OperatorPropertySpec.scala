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
      // default path (driver-local union-find for graphs this small)
      val got = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the distributed fixpoint loop must agree on the same graphs
      spark.conf.set("spark.graft.cc.localMaxEdges", "0")
      val gotLoop =
        try Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("spark.graft.cc.localMaxEdges")
      assert(got === gotLoop, s"seed=$seed local vs loop divergence")
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

  test("chunkDocuments: coverage + reconstruction for random sizes/strides") {
    import spark.implicits._
    val cfgGen = for {
      size <- Gen.choose(2, 40)
      stride <- Gen.choose(1, size)
      nTok <- Gen.choose(1, 120)
    } yield (size, stride, nTok)
    (0 until 8).foreach { seed =>
      val (size, stride, nTok) = cfgGen.apply(params, rng.Seed(seed.toLong)).get
      val toks = (1 to nTok).map(i => s"w$i")
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = Corpus.chunkDocuments(docs, "doc_id", "text", size, stride)
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
      // chunk i starts at i*stride, is `size` long except a shorter tail
      chunks.zipWithIndex.foreach { case ((cid, ck), i) =>
        assert(cid === i.toLong)
        assert(ck === toks.slice(i * stride, i * stride + size),
          s"seed=$seed size=$size stride=$stride chunk=$i")
      }
      // full coverage: the last chunk reaches the last token; minimality:
      // every chunk but the first starts inside the stream
      assert(chunks.last._2.last === toks.last, s"seed=$seed $size/$stride/$nTok")
      assert(chunks.length === 1 + math.max(0,
        math.ceil((nTok - size).max(0).toDouble / stride).toInt),
        s"seed=$seed size=$size stride=$stride nTok=$nTok got ${chunks.length}")
    }
  }

  test("asofJoin == per-row max-predecessor scan on random streams") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nl, for {
        k <- Gen.choose(1L, 3L); ts <- Gen.choose(0L, 100L)
      } yield (k, ts))
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 3L); ts <- Gen.choose(0L, 100L)
      } yield (k, ts))
    } yield (lefts, rights.distinct) // right unique per (key, ts)
    (0 until 8).foreach { seed =>
      val (lefts, rights) = gen.apply(params, rng.Seed(seed.toLong)).get
      val lDf = lefts.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("id", "k", "ts")
      val rDf = rights.map { case (k, ts) => (k, ts, ts * 2.0) }.toDF("k", "rts", "v")
      val got = Temporal.asofJoin(lDf, rDf, "k", "ts", "rts", Seq("v"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      lefts.zipWithIndex.foreach { case ((k, ts), i) =>
        val expected = rights.filter(r => r._1 == k && r._2 <= ts)
          .map(_._2).maxOption
        assert(got(i.toLong) === expected, s"seed=$seed left=$i key=$k ts=$ts")
      }
    }
  }

  test("duplicateSpans: invariants hold on random duplicated corpora") {
    import spark.implicits._
    val window = 6
    // docs assembled from a tiny vocab so cross-doc window repeats occur
    val docGen = for {
      nDocs <- Gen.choose(4, 10)
      docs <- Gen.listOfN(nDocs, Gen.choose(8, 30).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (0 until 5).foreach { seed =>
      val docs = docGen.apply(params, rng.Seed(seed.toLong)).get
      val df = docs.toDF("doc_id", "text")
      val lens = docs.map { case (id, t) => id -> t.split("\\s+").length.toLong }.toMap
      val spans = Dedup.duplicateSpans(df, "doc_id", "text",
        window = window, sel = 1, minDocs = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      spans.foreach { case (id, s, e, nw) =>
        assert(s >= 0 && e >= s && nw >= 1, s"seed=$seed malformed span ($id,$s,$e,$nw)")
        // inclusive span end stays inside the document's token range
        assert(e <= lens(id) - 1 + (window - 1), s"seed=$seed span past doc end")
      }
      // islands within one doc are disjoint AND non-adjacent (else merged)
      spans.groupBy(_._1).foreach { case (id, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) =>
            assert(s2 > e1 + 1 - window, s"seed=$seed overlapping windows unmerged in doc $id")
            assert(s2 > e1, s"seed=$seed islands overlap in doc $id")
          case _ =>
        }
      }
      // every reported window really is duplicated: at sel=1 the span
      // text under any start in [s, e-window+1] occurs in >= 2 docs
      val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\s+") }.toMap
      def spanText(id: Long, p: Int): String = {
        val w = toks(id)
        if (w.length < window) w.mkString(" ")
        else w.slice(p, p + window).mkString(" ")
      }
      spans.foreach { case (id, s, e, _) =>
        val starts = (s.toInt to math.max(s.toInt, e.toInt - window + 1))
        val dupStart = starts.find { p =>
          val t = spanText(id, p)
          docs.count { case (oid, _) =>
            val w = toks(oid)
            val cand =
              if (w.length < window) Seq(w.mkString(" "))
              else w.sliding(window).map(_.mkString(" ")).toSeq
            cand.contains(t)
          } >= 2
        }
        assert(dupStart.isDefined, s"seed=$seed span ($id,$s,$e) has no duplicated window")
      }
    }
  }

  test("capPerGroup == in-memory hash-ranked take on random groups and caps") {
    import spark.implicits._
    val rowGen = for {
      id <- Gen.choose(1L, 500L)
      grp <- Gen.choose(1, 6).map(g => s"g$g")
    } yield (id, grp)
    (0 until 4).foreach { seed =>
      val rows = (0 until 200)
        .flatMap(i => rowGen.apply(params, rng.Seed(seed * 1000L + i)))
        .distinct
      val cap = 1 + seed * 3
      val got = Corpus.capPerGroup(rows.toDF("id", "grp"), "id", "grp", cap)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // reference: per group, keep the cap lowest (knuthHash(id), id) rows
      def knuth(id: Long): Long = Math.floorMod(id * 2654435761L, 4294967296L)
      // .toSeq before flatMap: flatMapping a Map with tuple results
      // would re-key by id and collapse same-id rows across groups
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        rs.sortBy { case (id, _) => (knuth(id), id) }.take(cap)
      }.toSet
      assert(got === expected, s"seed=$seed cap=$cap")
    }
  }

  test("knnClassify == in-memory vote on random labeled vectors") {
    import spark.implicits._
    val vecGen = for {
      x <- Gen.choose(-100, 100)
      y <- Gen.choose(-100, 100)
      z <- Gen.choose(-100, 100) if x != 0 || y != 0 || z != 0
    } yield Array(x / 100.0f, y / 100.0f, z / 100.0f)
    (0 until 3).foreach { seed =>
      val corpus = (0 until 40).map { i =>
        val v = vecGen.apply(params, rng.Seed(seed * 1000L + i)).get
        (i.toLong, v, (i % 3).toLong)
      }
      val queries = corpus.take(5).map { case (id, v, _) => (id + 1000, v) }
      val k = 5
      val got = Similarity.knnClassify(
        queries.toDF("vec_id", "embedding"),
        corpus.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "vec_id", "embedding", "label", k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
        if (na * nb == 0.0) 0.0 else d / (na * nb)
      }
      val expected = queries.map { case (qid, qv) =>
        val nn = corpus
          .map { case (cid, cv, lbl) => (cid, lbl, cos(qv, cv)) }
          .sortBy { case (cid, _, c) => (-c, cid) }
          .take(k)
        val votes = nn.groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (lbl, n) => (-n, lbl) }
        qid -> (votes.head._1, votes.head._2.toLong)
      }.toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("htmlToText: markup-free text reduces to whitespace normalization; idempotent") {
    import spark.implicits._
    // words + whitespace runs + characters adjacent to the chain's
    // special handling: a bare & (never forming an entity, since a
    // separator always follows), quotes, non-ASCII ("<"/">" excluded —
    // angle brackets ARE markup to a regex extractor, by design)
    val wordGen = Gen.oneOf("key", "agg", "row", "a", "&", "\"",
      "café", "☃")
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \n ", "\r\n")
    val textGen = for {
      n <- Gen.choose(0, 24)
      parts <- Gen.listOfN(n, Gen.zip(wordGen, sepGen))
    } yield parts.map { case (w, s) => w + s }.mkString
    (0 until 8).foreach { seed =>
      val raw = textGen.apply(params, rng.Seed(seed.toLong)).get
      val got = Seq(raw).toDF("t")
        .select(TextAnalysis.htmlToText(col("t")).as("v"))
        .collect()(0).getString(0)
      // reference: whitespace normalization only (no tags to strip)
      val expected = raw
        .replaceAll("&lt;", "<").replaceAll("&gt;", ">")
        .replaceAll("&quot;", "\"").replaceAll("&#39;", "'")
        .replaceAll("&nbsp;", " ").replaceAll("&amp;", "&")
        .replaceAll("[ \\t\\r]+", " ")
        .replaceAll(" ?\\n ?", "\n")
        .replaceAll("\\n+", "\n")
        .replaceAll("^\\s+|\\s+$", "")
      assert(got === expected, s"seed=$seed raw=${raw.take(80)}")
      // extraction is idempotent: extracted text contains no markup
      val again = Seq(got).toDF("t")
        .select(TextAnalysis.htmlToText(col("t")).as("v"))
        .collect()(0).getString(0)
      assert(again === got, s"seed=$seed not idempotent")
    }
  }

  test("count-min: certificate and merge identity on random weighted streams") {
    import spark.implicits._
    import graft.functions.CmSketchExpression
    val streamGen = for {
      vocab <- org.scalacheck.Gen.choose(3, 40)
      rows <- org.scalacheck.Gen.choose(5, 200)
      data <- org.scalacheck.Gen.listOfN(rows, for {
        t <- org.scalacheck.Gen.choose(0, vocab - 1)
        w <- org.scalacheck.Gen.choose(0L, 50L)
      } yield (s"t$t", w))
      w <- org.scalacheck.Gen.choose(2, 12)
      d <- org.scalacheck.Gen.choose(1, 5)
    } yield (data, w, d)
    (0 until 6).foreach { seed =>
      val (data, w, d) = streamGen.apply(params, rng.Seed(seed.toLong)).get
      val hv = graft.functions.KrHashExpression.krHash(col("term"))
      val df = data.toDF("term", "wt")
      val sk = df.agg(CmSketchExpression.cmSketch(hv, col("wt"), w, d).as("sk"))
      val terms = data.map(_._1).distinct :+ "absent_zz"
      val ests = sk.select(terms.map(t =>
          Sketches.cmEstimate(col("sk"),
            graft.functions.KrHashExpression.krHash(lit(t)), w, d).as(t)): _*)
        .collect()(0)
      val truth = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val totalMass = data.map(_._2).sum
      terms.zipWithIndex.foreach { case (t, i) =>
        val est = ests.getLong(i)
        val tru = truth.getOrElse(t, 0L)
        // one-sided certificate, and the over-count is bounded by the
        // rest of the stream's mass (everything else that could collide)
        assert(est >= tru, s"seed=$seed $t est=$est true=$tru")
        assert(est <= totalMass, s"seed=$seed $t est=$est total=$totalMass")
      }
      // merge identity: any split's element-wise sum equals the whole
      val (a, b) = data.splitAt(data.length / 2)
      def matrix(part: Seq[(String, Long)]): Seq[Long] =
        if (part.isEmpty) Seq.fill(w * d)(0L)
        else part.toDF("term", "wt")
          .agg(CmSketchExpression.cmSketch(
            graft.functions.KrHashExpression.krHash(col("term")), col("wt"), w, d).as("sk"))
          .collect()(0).getSeq[Long](0)
      val whole = sk.collect()(0).getSeq[Long](0)
      assert(matrix(a).zip(matrix(b)).map { case (x, y) => x + y } == whole,
        s"seed=$seed merge identity")
    }
  }

  test("reciprocalRankFusion: channel order never matters; single channel preserves order") {
    import spark.implicits._
    val runGen = for {
      docs <- org.scalacheck.Gen.choose(2, 30)
      qs <- org.scalacheck.Gen.choose(1, 4)
      runs <- org.scalacheck.Gen.listOfN(3, org.scalacheck.Gen.listOfN(qs,
        org.scalacheck.Gen.someOf(0L until docs.toLong)))
    } yield runs.map(_.zipWithIndex.flatMap { case (ds, q) =>
      new scala.util.Random(docs * 31 + q).shuffle(ds.toSeq).zipWithIndex
        .map { case (doc, r) => (q.toLong, doc, (r + 1).toLong) }
    })
    (0 until 5).foreach { seed =>
      val runs = runGen.apply(params, rng.Seed(seed.toLong)).get
        .map(_.toDF("query_id", "doc_id", "rank"))
      def rows(rs: Seq[org.apache.spark.sql.DataFrame]) =
        TextAnalysis.reciprocalRankFusion(rs, k = 50)
          .orderBy("query_id", "rank").collect().map(_.toString).toSeq
      // permuting the channels changes nothing (sum is commutative)
      assert(rows(runs) == rows(runs.reverse), s"seed=$seed")
      // one channel alone: fusion is a monotone transform of its ranks
      val single = runs.head
      val fused = TextAnalysis.reciprocalRankFusion(Seq(single), k = 50)
        .select("query_id", "doc_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val orig = single.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // ties in the 1e6 div (60+rank) fixed-point can merge adjacent
      // ranks only when contributions collide — identical contributions
      // only happen at identical source ranks, which ranked runs forbid,
      // so per query the fused order must equal the source order
      assert(fused.keySet == orig.keySet, s"seed=$seed")
      fused.groupBy(_._1._1).foreach { case (_, qf) =>
        val byFused = qf.toSeq.sortBy(_._2).map(_._1)
        val byOrig = qf.toSeq.sortBy(t => orig(t._1)).map(_._1)
        assert(byFused == byOrig, s"seed=$seed single-channel order")
      }
    }
  }
}
