package graft

import graft.queries.BenchSplits
import org.scalatest.funsuite.AnyFunSuite

/**
 * The bench build/probe decompositions must RUN: a split that throws at
 * bench time degrades to an absent subtimings entry (by design — the
 * bench line must never break), which silently strips the vs_committed
 * guard of its probe-level exoneration basis for that query. Each split
 * is smoke-run here at sf0.001 and must yield ordered, positive phases
 * that include the serving phase the exoneration sums.
 */
class BenchSplitsSpec extends AnyFunSuite with SparkTest {

  test("every registered split runs and yields a build phase plus a serving phase") {
    BenchSplits.splits.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val phases = f(spark, sf0001)
      val names = phases.map(_._1)
      assert(names.head == "build", s"$name: first phase must be the build, got $names")
      assert(names.length >= 2 && names.distinct == names,
        s"$name: needs distinct build + serving phases, got $names")
      phases.foreach { case (ph, t) =>
        assert(t >= 0.0, s"$name/$ph: negative timing $t")
      }
      // the probe-exoneration contract: non-build phases exist to sum
      assert(Bench.probeVerdict(Some(phases.toMap),
        Some(phases.toMap)).exists(_._3),
        s"$name: a run must exonerate against itself")
    }
  }
}
