package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench harness's statistics — the graded artifact's
  * numbers flow through these, so their edge cases (even run counts,
  * failed-run sentinels) are locked here rather than re-derived from
  * BENCH_FULL.json diffs. */
class BenchStatsSpec extends AnyFunSuite {

  test("medianOf: odd counts take the middle, even counts average the " +
      "two middles (RUNS=2 must not report the slower warmup run)") {
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.medianOf(Seq(4.0, 2.0)) === 3.0)
    assert(Bench.medianOf(Seq(5.0)) === 5.0)
  }

  test("medianOf: failed runs (-1) are dropped; all-failed reports -1") {
    assert(Bench.medianOf(Seq(-1.0, 2.0, 4.0)) === 3.0)
    assert(Bench.medianOf(Seq(-1.0)) === -1.0)
    assert(Bench.medianOf(Seq.empty) === -1.0)
  }

  test("spreadOf: (max-min)/median over successful runs; 0 when fewer " +
      "than 2 successes or a non-positive median") {
    assert(Bench.spreadOf(Seq(1.0, 3.0), 2.0) === 1.0)
    assert(Bench.spreadOf(Seq(2.0, -1.0, 2.0), 2.0) === 0.0)
    assert(Bench.spreadOf(Seq(5.0), 5.0) === 0.0)
    assert(Bench.spreadOf(Seq(1.0, 2.0), -1.0) === 0.0)
  }

  test("windowLoadOf: max of the last probe at/before the index and " +
      "the first after it — the retry trigger AND benchdiff.py's mirror") {
    // probes at queries-completed 0, 25, 50 with values 1.0, 2.0, 1.1
    val ps = Seq((0, 0.0, 1.0), (25, 60.0, 2.0), (50, 120.0, 1.1))
    assert(Bench.windowLoadOf(ps, 10) === 2.0)  // before=1.0, after=2.0
    assert(Bench.windowLoadOf(ps, 25) === 2.0)  // before=2.0, after=1.1
    assert(Bench.windowLoadOf(ps, 40) === 2.0)  // before=2.0, after=1.1
    assert(Bench.windowLoadOf(ps, 60) === 1.1)  // past the last probe
    assert(Bench.windowLoadOf(Nil, 5) === 0.0)
  }

  test("spliceIsolated: inserts into a sweep artifact, replaces a " +
      "previous map in a full artifact, and re-splices an " +
      "isolated-only file WITHOUT leaving a stale duplicate key") {
    val iso1 = """{"q1":{"median":1.0}}"""
    val iso2 = """{"q2":{"median":2.0}}"""
    // sweep artifact, no isolated yet
    val sweep = """{"metric":"total","value":9.9}"""
    assert(Bench.spliceIsolated(sweep, iso1) ===
      s"""{"isolated":$iso1,"metric":"total","value":9.9}""")
    // full artifact with an existing isolated map → replaced, once
    val full = s"""{"isolated":$iso1,"metric":"total","value":9.9}"""
    val re = Bench.spliceIsolated(full, iso2)
    assert(re === s"""{"isolated":$iso2,"metric":"total","value":9.9}""")
    // isolated-only file (the map ends with '}' not '},') → no stale
    // duplicate key and no trailing comma
    val only = s"""{"isolated":$iso1}"""
    val re2 = Bench.spliceIsolated(only, iso2)
    assert(re2 === s"""{"isolated":$iso2}""")
  }

  test("extractTopLevelMap: finds the map wherever it sits (first, " +
      "middle, last — the r13 regex left a stale comma for non-first), " +
      "removes exactly one adjacent comma, and ignores a same-named key " +
      "nested inside another map (a query literally named 'isolated')") {
    val iso = """{"q1":{"median":1.0},"q2":{"median":2.0}}"""
    // first
    assert(Bench.extractTopLevelMap(s"""{"isolated":$iso,"v":1}""", "isolated")
      === Some((iso, """{"v":1}""")))
    // middle
    assert(Bench.extractTopLevelMap(s"""{"a":1,"isolated":$iso,"v":2}""", "isolated")
      === Some((iso, """{"a":1,"v":2}""")))
    // last — the regex-era failure mode: must not leave ",}"
    assert(Bench.extractTopLevelMap(s"""{"a":1,"isolated":$iso}""", "isolated")
      === Some((iso, """{"a":1}""")))
    // nested same-named key is NOT top-level → untouched
    val nested = """{"detailed":{"isolated":{"median":3.0}},"v":1}"""
    assert(Bench.extractTopLevelMap(nested, "isolated") === None)
    // key inside a string literal is not a key
    val inStr = """{"note":"\"isolated\":{}","v":1}"""
    assert(Bench.extractTopLevelMap(inStr, "isolated") === None)
    // absent
    assert(Bench.extractTopLevelMap("""{"v":1}""", "isolated") === None)
  }

  test("spliceIsolated round-trip pins the sweep-preserve path: a new " +
      "sweep line re-spliced with the floors extracted from the old " +
      "artifact keeps the floors (What's-missing r13 #4)") {
    val iso = """{"q1":{"median":1.0}}"""
    val oldArtifact = s"""{"isolated":$iso,"metric":"total","value":9.9}"""
    val newSweepLine = """{"metric":"total","value":8.8}"""
    val carried = Bench.extractTopLevelMap(oldArtifact, "isolated").map(_._1)
    assert(carried === Some(iso))
    assert(Bench.spliceIsolated(newSweepLine, carried.get) ===
      s"""{"isolated":$iso,"metric":"total","value":8.8}""")
  }
}
