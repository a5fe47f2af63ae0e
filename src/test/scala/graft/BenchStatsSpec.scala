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
}
