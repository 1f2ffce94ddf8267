package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The bench cross-run guard's decision function (Bench.sustainedOutlier):
 * a query is flagged against the COMMITTED artifact only when it exceeds
 * TWICE the committed time by more than the absolute noise floor
 * (Bench.NoiseFloorSec = 0.5 s) — sub-second queries jitter past 2x on
 * scheduler noise alone (the r9 q_dedup_simhash artifact flag), and an
 * absent/failed committed number disarms. (The end-to-end flag firing is
 * demonstrated by running Bench with a planted baseline — recorded in
 * SURVEY §8.3.)
 */
class BenchGuardSpec extends AnyFunSuite {
  test("sustained-outlier decision: 2x + absolute noise floor, armed baseline") {
    assert(Bench.NoiseFloorSec == 0.5, "the floor the r10 verdict prescribed is pinned")
    assert(Bench.sustainedOutlier(now = 2.75, base = 0.72), "the r7 q_sessionize case must flag")
    assert(!Bench.sustainedOutlier(now = 1.25, base = 0.59),
      "the r9 q_dedup_simhash case: 2.1x on a 0.59 s query lands under 2x+0.5 s — " +
        "scheduler jitter a query with no build phase can never exonerate")
    assert(!Bench.sustainedOutlier(now = 1.3, base = 0.72), "under 2x: not an outlier")
    assert(!Bench.sustainedOutlier(now = 0.20, base = 0.05),
      "4x on a 50 ms query is scheduler noise, the floor holds it back")
    assert(!Bench.sustainedOutlier(now = 0.50, base = 0.05),
      "10x but only +0.45 s: still under the 0.5 s floor")
    assert(Bench.sustainedOutlier(now = 0.65, base = 0.05),
      "13x and 0.55 s past the 2x line: a small base can still flag on real loss")
    assert(!Bench.sustainedOutlier(now = 5.0, base = -1.0), "no committed number disarms")
    assert(!Bench.sustainedOutlier(now = 5.0, base = 0.0), "zero committed disarms")
    assert(!Bench.sustainedOutlier(now = 1.0, base = 0.4),
      "2.5x but only 0.2 s past the 2x line: under the floor")
    assert(Bench.sustainedOutlier(now = 1.5, base = 0.4), "3.75x and +0.7 s past 2x: flags")
    assert(!Bench.sustainedOutlier(now = 0.8, base = 0.4), "exactly 2x: not over")
    assert(!Bench.sustainedOutlier(now = 2.9, base = 1.2),
      "2.4x on a 1.2 s query but exactly on the 2x+0.5 boundary: not strictly over")
  }

  test("probe-level exoneration: build-inclusive flags clear when the serving phase held") {
    def ph(build: Double, probe: Double) = Some(Map("build" -> build, "probe" -> probe))
    // the r8 shape: q_phrase 1.86->7.04 s compound, but the probe half held
    assert(Bench.probeVerdict(ph(6.5, 0.54), ph(1.4, 0.46)) === Some((0.54, 0.46, true)),
      "build inflated 4.6x, probe within noise: exonerated")
    assert(Bench.probeVerdict(ph(2.0, 2.1), ph(1.4, 0.46)) === Some((2.1, 0.46, false)),
      "probe itself a sustained outlier: NOT exonerated")
    assert(Bench.probeVerdict(None, ph(1.4, 0.46)).isEmpty,
      "no current subtimings: no basis to exonerate")
    assert(Bench.probeVerdict(ph(6.5, 0.54), None).isEmpty,
      "no committed subtimings: no basis to exonerate")
    assert(Bench.probeVerdict(Some(Map("probe" -> 0.5)), ph(1.4, 0.46)).isEmpty,
      "no build phase on the current side: the compound has no build to blame")
    // multi-phase serving (e.g. a future build+probe+rerank split) sums all
    // non-build phases on both sides
    val Some((pn, pb, ok)) = Bench.probeVerdict(
      Some(Map("build" -> 9.0, "probe" -> 0.3, "rerank" -> 0.2)),
      Some(Map("build" -> 1.0, "probe" -> 0.25, "rerank" -> 0.2)))
    assert(math.abs(pn - 0.5) < 1e-9 && math.abs(pb - 0.45) < 1e-9 && ok)
    // build-PREFIXED phases are build-side: q_rag_indexed's attach-time
    // calibration sweep must not pollute the serving sum
    val Some((cn, cb, cok)) = Bench.probeVerdict(
      Some(Map("build" -> 9.0, "build_calibrate" -> 4.0, "probe" -> 0.3)),
      Some(Map("build" -> 1.0, "build_calibrate" -> 0.9, "probe" -> 0.28)))
    assert(math.abs(cn - 0.3) < 1e-9 && math.abs(cb - 0.28) < 1e-9 && cok)
  }

  test("even-count medians take the lower middle (the reps=1 confirmation run can clear a flag)") {
    // the guard adds one batch of reps on a suspected outlier; with
    // SPARK_GRAFT_BENCH_REPS=1 that leaves TWO samples, and the
    // upper-middle median would return the CONTENDED first run even after
    // a fast confirming re-run — the lower middle breaks toward quiet-box
    val samples = Seq(2.7, 0.7).sorted
    assert(samples((samples.length - 1) / 2) == 0.7,
      "two-sample median must be the faster run")
    val six = Seq(0.5, 0.55, 0.6, 0.62, 2.4, 2.6).sorted
    assert(six((six.length - 1) / 2) == 0.6,
      "six-sample median biases toward the quiet-box cluster")
  }
}
