package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-11 canary gate on the bench artifact: a run whose
  * q_multijoin canary is outside the committed band must NOT clobber
  * BENCH.json (it lands in BENCH_outofband.json), and an in-band run
  * FOLDS per-query minima into history instead of replacing it. This is
  * the discipline BASELINE.md documented in prose since round 6; round
  * 10 showed prose is not enforcement (a uniform 1.45x-hot driver run
  * overwrote the committed fold with zero flags).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("canary in band: within factor of committed min") {
    assert(Bench.canaryInBand(Some(0.9), Some(1.15)))
    assert(Bench.canaryInBand(Some(0.9), Some(0.9 * Bench.CanaryBandFactor)))
    // round-10's actual driver capture: 1.273 vs committed 0.892 — out
    assert(!Bench.canaryInBand(Some(0.892), Some(1.273)))
    // faster than history is always in band (quiet host, fold takes min)
    assert(Bench.canaryInBand(Some(0.9), Some(0.6)))
  }

  test("canary gate opens when there is nothing to judge with") {
    assert(Bench.canaryInBand(None, Some(1.0)))   // no committed history
    assert(Bench.canaryInBand(Some(0.9), None))   // canary not in this run
    assert(Bench.canaryInBand(None, None))
  }

  test("a FAILED canary (-1) gates closed") {
    assert(!Bench.canaryInBand(Some(0.9), Some(-1.0)))
    assert(!Bench.canaryInBand(None, Some(-1.0)))
  }

  test("guard routes out-of-band runs away from the committed artifact") {
    val d = Bench.guard("BENCH.json", inBand = false, force = false)
    assert(d.path == "BENCH_outofband.json" && !d.fold)
    val in = Bench.guard("BENCH.json", inBand = true, force = false)
    assert(in.path == "BENCH.json" && in.fold)
    // explicit side files (partial runs, driver SPARK_GRAFT_BENCH_OUT)
    // are written as requested, never folded
    val side = Bench.guard("BENCH_partial.json", inBand = false, force = false)
    assert(side.path == "BENCH_partial.json" && !side.fold)
    // force = rebaseline: replace outright even out of band
    val f = Bench.guard("BENCH.json", inBand = false, force = true)
    assert(f.path == "BENCH.json" && !f.fold)
  }

  test("fold takes per-query minima, keeps failures visible, drops stale names") {
    val prior = Map("a" -> 1.0, "b" -> 2.0, "gone" -> 0.5, "c" -> 3.0)
    val fresh = Seq("a" -> 1.5, "b" -> 1.8, "c" -> -1.0, "new" -> 0.7)
    val folded = Bench.foldQueries(prior, fresh).toMap
    assert(folded("a") == 1.0)     // history faster -> keep history
    assert(folded("b") == 1.8)     // fresh faster -> take fresh
    assert(folded("c") == -1.0)    // live failure is never masked
    assert(folded("new") == 0.7)   // new catalog row
    assert(!folded.contains("gone")) // dropped from catalog -> dropped
  }

  test("prior parse tolerates merge_bench.py's spaced JSON") {
    val dir = java.nio.file.Files.createTempDirectory("benchprior")
    val f = dir.resolve("BENCH.json")
    java.nio.file.Files.writeString(f,
      """{"metric": "total", "value": 88.478, "unit": "sec", "queries": {"q1_agg": 0.301, "q_multijoin": 0.892}, "runs": {}}""")
    val m = Bench.priorQueryTimesForTest(f.toString)
    assert(m === Map("q1_agg" -> 0.301, "q_multijoin" -> 0.892))
    // and the compact no-space form Bench itself writes
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":1.0,"queries":{"a":0.5,"b":-1.0},"runs":{}}""")
    assert(Bench.priorQueryTimesForTest(f.toString) ===
      Map("a" -> 0.5, "b" -> -1.0))
  }

  test("regressedVsFold surfaces a masked slowdown, ignores jitter") {
    val prior = Map("slowed" -> 1.0, "jitter" -> 0.1, "fine" -> 1.0,
      "failed" -> 1.0)
    val fresh = Seq("slowed" -> 2.0, "jitter" -> 0.3, "fine" -> 1.2,
      "failed" -> -1.0, "new" -> 9.0)
    val r = Bench.regressedVsFold(prior, fresh)
    // the deliberate 2x slowdown is visible even though the FOLD would
    // print the stale 1.0s min
    assert(r === Seq("slowed" -> 2.0))
    // sub-0.5s jitter (3x but 0.3s), in-band noise (1.2x), failures
    // (flagged separately) and new names never trip it
  }

  test("selectPrinted admits the prior printed set before slowest-first") {
    def len(p: (String, Double)) = f""""${p._1}":${p._2}%.2f""".length
    val folded = Seq("big" -> 9.0, "mid" -> 5.0, "sped_up" -> 0.1,
      "small" -> 1.0)
    // budget fits ~3 entries; "sped_up" was printed last round and is
    // now the FASTEST — it must still be admitted (no phantom drop)
    val budget = len("big" -> 9.0) + len("sped_up" -> 0.1) +
      len("mid" -> 5.0) + 3
    val got = Bench.selectPrinted(folded, Seq("sped_up"), budget, len)
    assert(got.map(_._1) === Seq("big", "mid", "sped_up"),
      s"got $got") // rendered slowest-first, set includes prior names
    // and two consecutive runs with the same catalog print the same set
    val again = Bench.selectPrinted(folded, got.map(_._1), budget, len)
    assert(again.map(_._1) === got.map(_._1))
  }

  test("priorPrintedNames round-trips the printed field") {
    val dir = java.nio.file.Files.createTempDirectory("benchprinted")
    val f = dir.resolve("BENCH.json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","queries":{"a":0.5},"printed":["a","b_x"],"sf":"x"}""")
    assert(Bench.priorPrintedNames(f.toString) === Seq("a", "b_x"))
    java.nio.file.Files.writeString(f, """{"metric":"total"}""")
    assert(Bench.priorPrintedNames(f.toString) === Seq.empty)
  }

  test("out-of-band write provably leaves BENCH.json untouched") {
    val dir = java.nio.file.Files.createTempDirectory("benchguard")
    val committed = dir.resolve("BENCH.json")
    val original = """{"metric":"total","value":88.478,"queries":{"q_multijoin":0.892}}"""
    java.nio.file.Files.writeString(committed, original)
    // the hot run decides its path BEFORE any write happens
    val d = Bench.guard("BENCH.json", inBand = false, force = false)
    java.nio.file.Files.writeString(dir.resolve(d.path), """{"hot":true}""")
    assert(java.nio.file.Files.readString(committed) == original)
    assert(java.nio.file.Files.exists(dir.resolve("BENCH_outofband.json")))
  }
}
