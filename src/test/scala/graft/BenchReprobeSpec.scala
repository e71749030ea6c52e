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
