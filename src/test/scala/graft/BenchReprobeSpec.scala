package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's outlier re-probe trigger (r16 committed a 68 s
  * disk-churn transient for a 3.2 s query — the trigger exists so a
  * transient can never again become the round's official number) and
  * the previous-artifact parse that feeds it.
  */
class BenchReprobeSpec extends AnyFunSuite {

  test("needsReprobe: fires only above 3x AND 2s absolute drift") {
    // the r16 incident: 3.9 s prior artifact, 68.0 s in-suite
    assert(Bench.needsReprobe(prev = 3.9, cur = 68.0))
    // 3x-but-small: sub-second jitter must not trigger a re-probe
    assert(!Bench.needsReprobe(prev = 0.1, cur = 0.4))
    assert(!Bench.needsReprobe(prev = 0.5, cur = 2.0))
    // big-but-under-3x: a real 2x regression is a finding, not a transient
    assert(!Bench.needsReprobe(prev = 10.0, cur = 25.0))
    // boundary: exactly 3x does not fire (strict >)
    assert(!Bench.needsReprobe(prev = 2.0, cur = 6.0))
    assert(Bench.needsReprobe(prev = 2.0, cur = 6.01))
    // 3x satisfied but absolute drift exactly 2s does not fire
    assert(!Bench.needsReprobe(prev = 0.9, cur = 2.9))
    // failed reps (-1 sentinels) never trigger in either position
    assert(!Bench.needsReprobe(prev = -1.0, cur = 50.0))
    assert(!Bench.needsReprobe(prev = 5.0, cur = -1.0))
    assert(!Bench.needsReprobe(prev = 0.0, cur = 50.0))
  }

  private val blob =
    """{"sf":"/root/testdata/sf0.1","reps":3,"total":265.299,"failed":[],""" +
      """"queries":{"q_a3_listagg":0.599,"q_text_cosine_sparse":68.031,""" +
      """"q_text_cosine_sparse_solo":4.1,"q_neg":-1},""" +
      """"params":{"agg":"median","load":2.65,"bpe_cold":1.2}}"""

  test("parsePrevQueryTimes: extracts q_ keys, drops _solo entries, keeps -1 sentinels") {
    val m = Bench.parsePrevQueryTimes(blob, "/root/testdata/sf0.1")
    assert(m("q_a3_listagg") == 0.599)
    assert(m("q_text_cosine_sparse") == 68.031)
    assert(!m.contains("q_text_cosine_sparse_solo"),
      "a solo probe must not become the next round's suite baseline")
    assert(m("q_neg") == -1.0)
    // params keys (not q_-prefixed) never leak into the baseline map
    assert(!m.contains("bpe_cold") && !m.contains("load"))
  }

  test("parsePrevQueryTimes: sf mismatch yields no baseline at all") {
    // a local sf0.01 dev run must not compare against the committed
    // sf0.1 artifact — every query would trip the ratio in reverse
    assert(Bench.parsePrevQueryTimes(blob, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parsePrevQueryTimes("not json", "/root/testdata/sf0.1").isEmpty)
  }

  test("slow-tail floor: queries at or above 3s solo-probe unconditionally") {
    // the ratio trigger alone can't catch a transient whose baseline
    // was itself inflated — the floor makes the slow tail self-verify
    assert(Bench.SlowSoloFloorSec === 3.0)
    // 9.8s vs an inflated 16.8s baseline: ratio trigger silent...
    assert(!Bench.needsReprobe(prev = 16.76, cur = 9.84))
    // ...but the floor catches it (the composed condition in main)
    assert(9.84 >= Bench.SlowSoloFloorSec)
    assert(2.9 < Bench.SlowSoloFloorSec, "sub-floor queries rely on the ratio trigger")
  }

  test("ioDegradedQueries: committed median >3x its same-run solo receipt flags the run") {
    // the r17 incident, verbatim: the official artifact said
    // degraded:false while carrying 127.4 committed vs 9.6 solo
    val results = Seq("q_text_cosine_incremental" -> 127.4,
      "q_text_cosine_sparse" -> 17.4, "q_corpus_leak_split" -> 4.2,
      "q_fast" -> 0.3)
    val reprobed = Seq("q_text_cosine_incremental_solo" -> 9.6,
      "q_text_cosine_sparse_solo" -> 6.2, "q_corpus_leak_split_solo" -> 3.1)
    assert(Bench.ioDegradedQueries(results, reprobed) ===
      Seq("q_text_cosine_incremental"),
      "only the >3x receipt gap flags; 2.8x and 1.4x agreements do not")
    // a clean run (every receipt confirms its median) flags nothing
    assert(Bench.ioDegradedQueries(
      Seq("q_a" -> 4.4), Seq("q_a_solo" -> 4.1)).isEmpty)
    // a failed solo (-1) or a solo with no matching suite entry is inert
    assert(Bench.ioDegradedQueries(
      Seq("q_a" -> 44.0), Seq("q_a_solo" -> -1.0, "q_b_solo" -> 1.0)).isEmpty)
    // sub-2s absolute gaps don't flag even past 3x (needsReprobe's floor)
    assert(Bench.ioDegradedQueries(
      Seq("q_a" -> 1.9), Seq("q_a_solo" -> 0.5)).isEmpty)
    // several distorted queries all get named, sorted
    assert(Bench.ioDegradedQueries(
      Seq("q_z" -> 40.0, "q_a" -> 30.0),
      Seq("q_z_solo" -> 4.0, "q_a_solo" -> 3.0)) === Seq("q_a", "q_z"))
  }

  test("driftQueries: committed medians >2x their prior committed value self-identify; io_degraded names are suppressed") {
    // the r18 committed-run wobble, verbatim: dsir 0.96→2.73 (2.8x),
    // curation_verdicts 0.66→1.59 (2.4x) — both previously shipped
    // unexplained because solo receipts only exist ≥ 3 s
    val prev = Map("q_corpus_dsir_sample" -> 0.96,
      "q_corpus_curation_verdicts" -> 0.66, "q_corpus_leak_split" -> 3.60,
      "q_steady" -> 1.0, "q_small" -> 0.1, "q_slow" -> 20.0)
    val results = Seq("q_corpus_dsir_sample" -> 2.73,
      "q_corpus_curation_verdicts" -> 1.59, "q_corpus_leak_split" -> 6.24,
      "q_steady" -> 1.1, "q_small" -> 0.35, "q_slow" -> 55.0)
    val d = Bench.driftQueries(results, prev, excluded = Set("q_slow"))
    // worst ratio first; leak_split (1.7x) stays quiet — 2x is the bar;
    // q_small trips the ratio but not the 0.5 s absolute floor;
    // q_slow is already named by io_degraded and must not be re-named
    assert(d.map(_._1) ===
      Seq("q_corpus_dsir_sample", "q_corpus_curation_verdicts"), d)
    assert(d.head === (("q_corpus_dsir_sample", 0.96, 2.73)))
    // no prior artifact (or a failed prior/current) → nothing to say
    assert(Bench.driftQueries(results, Map.empty, Set.empty).isEmpty)
    assert(Bench.driftQueries(Seq("q_a" -> -1.0), Map("q_a" -> 1.0),
      Set.empty).isEmpty)
    assert(Bench.driftQueries(Seq("q_a" -> 9.0), Map("q_a" -> -1.0),
      Set.empty).isEmpty)
  }

  test("total_ex_reprobed substitutes the solo receipt, keeping the headline comparable to a clean round's total") {
    // r18 shape: dropping the io-degraded median entirely made the
    // total comparable only to rounds excluding the same set; the
    // substitution (total - median + solo) is what a clean box would
    // have measured. Replayed here through the same arithmetic main
    // uses (the pieces are pure).
    val results = Seq("q_hot" -> 127.4, "q_ok" -> 10.0)
    val reprobed = Seq("q_hot_solo" -> 9.6)
    val ioDeg = Bench.ioDegradedQueries(results, reprobed)
    assert(ioDeg === Seq("q_hot"))
    val total = results.map(_._2).sum
    val soloOf = reprobed.toMap
    val exReprobed = total - results.collect {
      case (n, v) if ioDeg.contains(n) && v > 0 =>
        v - math.max(0.0, soloOf.getOrElse(n + "_solo", 0.0))
    }.sum
    assert(math.abs(exReprobed - (9.6 + 10.0)) < 1e-9,
      "the inflated median is replaced by its receipt, not dropped")
  }

  test("trigger over a parsed artifact: transient re-probes, healthy neighbors don't") {
    val prev = Bench.parsePrevQueryTimes(blob, "/root/testdata/sf0.1")
    // this round the sparse query measures healthy again → no re-probe
    assert(!Bench.needsReprobe(prev("q_text_cosine_sparse"), 3.2))
    // a fresh transient on the listagg query → re-probe
    assert(Bench.needsReprobe(prev("q_a3_listagg"), 12.0))
    // a failed prior round (-1) never gates this round's reading
    assert(!Bench.needsReprobe(prev("q_neg"), 12.0))
  }
}
