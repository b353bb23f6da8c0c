package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication logic (pure functions — the Spark
  * loop itself is exercised by the driver every round): baseline
  * parsing and the suspect rules that decide which first-pass timings
  * get one corrective re-run.
  */
class BenchSpec extends AnyFunSuite {

  test("parseBaseline reads a flat name->seconds object, tolerates junk") {
    val m = Bench.parseBaseline(
      """{"q1_agg": 1.5, "j_asof_latest":0.98, "x":2e-1}""")
    assert(m == Map("q1_agg" -> 1.5, "j_asof_latest" -> 0.98, "x" -> 0.2))
    assert(Bench.parseBaseline("not json at all").isEmpty)
    assert(Bench.parseBaseline("").isEmpty)
  }

  private val flatCanary = Seq(0 -> 0.6, 5 -> 0.7, 10 -> 0.65)

  test("baseline rule: an inflated first sample is suspect, a faithful one is not") {
    val baseline = Map("a" -> 1.0, "b" -> 1.0, "c" -> 4.0)
    val times = Seq("a" -> 1.2, "b" -> 16.4, "c" -> 4.5)
    // b ran 16x its clean value (the r11 j_asof_latest case); a and c
    // are within factor
    assert(Bench.suspects(times, baseline, flatCanary, stride = 5) == Seq("b"))
  }

  test("baseline rule fires above 2x — the round bar — not just 3x") {
    // the r13 x_doc_repetition case: 2.7x its clean value, previously
    // below the 3x factor and so never adjudicated
    val baseline = Map("x_doc_repetition" -> 0.28, "ok" -> 1.0)
    val times = Seq("x_doc_repetition" -> 0.76, "ok" -> 1.9)
    assert(Bench.suspects(times, baseline, flatCanary, stride = 5) ==
      Seq("x_doc_repetition"))
  }

  test("floor: sub-half-second jitter never re-runs, even at high ratios") {
    val baseline = Map("a" -> 0.01)
    assert(Bench.suspects(Seq("a" -> 0.4), baseline, flatCanary, 5).isEmpty)
  }

  test("canary rule: gates within one stride of an inflated canary sample re-run") {
    // canary spike at pos 10 (39.5s vs min 0.6 — the r11 driver case)
    val canary = Seq(0 -> 0.6, 5 -> 0.65, 10 -> 39.5, 15 -> 0.7)
    val baseline = Map.empty[String, Double]
    val times = (0 until 20).map(i => s"q$i" -> 0.8)
    val got = Bench.suspects(times, baseline, canary, stride = 5).toSet
    // indices 5..15 straddle the spike; the rest stay
    assert(got == (5 to 15).map(i => s"q$i").toSet, got.toString)
  }

  test("median fallback (no baseline): only well-above-median, >2s gates re-run") {
    val times = (0 until 20).map(i => s"q$i" -> 1.0) :+ ("slow" -> 9.0) :+ ("mid" -> 1.9)
    val got = Bench.suspects(times, Map.empty, flatCanary, stride = 7)
    assert(got == Seq("slow"))
  }

  test("a genuinely expensive gate with a faithful baseline is never suspect") {
    // d_exact_substring-class: 3.7s clean, 3.9s now — real cost, no re-run
    val baseline = Map("d_exact_substring" -> 3.66)
    assert(Bench.suspects(
      Seq("d_exact_substring" -> 3.9), baseline, flatCanary, 5).isEmpty)
  }

  test("the committed baseline file parses and covers the registry") {
    val f = new java.io.File("scripts/bench_baseline.json")
    assert(f.isFile, "scripts/bench_baseline.json missing")
    val m = Bench.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val names = SparkEntry.queries.keySet
    val covered = names.count(m.contains)
    // every registered gate should carry a clean previous time (new
    // gates added after the last baseline refresh fall back to the
    // median rule, so a small gap is tolerated)
    assert(covered >= names.size - 10,
      s"baseline covers $covered of ${names.size} gates — refresh it")
  }
}
