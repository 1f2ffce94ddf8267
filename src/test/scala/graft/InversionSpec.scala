package graft

import graft.attack.Inversion
import graft.attack.Inversion.Params
import org.scalatest.funsuite.AnyFunSuite

class InversionSpec extends AnyFunSuite with SparkTest {

  private val small = Params(
    popSize = 16, generations = 5, eliteFrac = 0.25,
    restarts = 2, iters = 25, topK = 8, dim = 64, seed = 7L)

  test("mutations are pure functions of (text, seed)") {
    assert(Inversion.mutateChar("spark query", 99L) == Inversion.mutateChar("spark query", 99L))
    assert(Inversion.mutateWord("spark query", 99L) == Inversion.mutateWord("spark query", 99L))
    assert(Inversion.crossover("aaaa", "bbbb", 5L) == Inversion.crossover("aaaa", "bbbb", 5L))
    // alphabet closure for char mutation of alphabet-only input
    val m = Inversion.mutateChar("spark and 42 queries", 3L)
    assert(m.forall(c => c.isLower || c.isDigit || c == ' '))
  }

  test("embedText matches the Spark-side hashEmbed column exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val texts = Seq("Spark, the query engine!", "vector 42 search", "")
    val fromCol = texts.toDF("t")
      .select(TF.hashEmbed(TF.tokens(col("t")), 64).as("e"))
      .collect().map(_.getSeq[Float](0).toArray)
    texts.zip(fromCol).foreach { case (t, e) =>
      assert(Inversion.embedText(t, 64).toSeq == e.toSeq, s"mismatch for '$t'")
    }
  }

  test("evolutionary best-score trajectory is monotone non-decreasing") {
    val target = Inversion.embedText("spark query vector table join filter", 64)
    val (_, traj) = Inversion.evolutionarySearch(spark, target, small)
    assert(traj.nonEmpty)
    assert(traj.zip(traj.tail).forall { case (a, b) => b >= a }, s"trajectory $traj")
  }

  test("early stop cuts the loop once the threshold is crossed") {
    val target = Inversion.embedText("spark join batch query", 64)
    // Unreachable threshold -> all generations run.
    val full = small.copy(generations = 8, earlyStop = 2.0)
    val (_, trajFull) = Inversion.evolutionarySearch(spark, target, full)
    assert(trajFull.length == 8)
    // Threshold below what generation 0 already achieves -> stop immediately.
    val quick = small.copy(generations = 8, earlyStop = trajFull.head - 1e-9)
    val (cands, trajQuick) = Inversion.evolutionarySearch(spark, target, quick)
    assert(trajQuick.length == 1, s"expected immediate stop, got $trajQuick")
    assert(cands.head.score > quick.earlyStop)
  }

  test("frame-native evolutionary loop == driver loop generation for generation") {
    val target = Inversion.embedText("spark query vector table join filter", 64)
    val (cd, td) = Inversion.evolutionarySearch(spark, target, small)
    val (cf, tf) = Inversion.evolutionarySearchDF(spark, target, small)
    assert(tf == td,
      "the frame loop's best-score trajectory must match the driver loop per generation")
    assert(cf == cd, "the deduped per-generation bests must be identical")
    // early stop fires at the same generation on both loops
    val quick = small.copy(generations = 8, earlyStop = td.head - 1e-9)
    assert(Inversion.evolutionarySearchDF(spark, target, quick)._2.length ==
      Inversion.evolutionarySearch(spark, target, quick)._2.length)
  }

  test("full invert is reproducible and ranked") {
    val target = Inversion.embedText("spark query vector table", 64)
    val r1 = Inversion.invert(spark, target, small).collect().map(_.toSeq)
    val r2 = Inversion.invert(spark, target, small).collect().map(_.toSeq)
    assert(r1.toSeq == r2.toSeq, "seeded attack must be bit-reproducible")
    assert(r1.length <= small.topK && r1.nonEmpty)
    val scores = r1.map(_(1).asInstanceOf[Double]).toSeq
    assert(scores == scores.sorted.reverse, "ranked by descending score")
    val texts = r1.map(_(2).asInstanceOf[String]).toSeq
    assert(texts.distinct.length == texts.length, "dedup-keep-max leaves no dup texts")
  }

  test("q_attack_invert's fixture output is PINNED row for row — RNG-schedule drift must fail loudly") {
    // The one registered query with no DuckDB oracle: the driver can only
    // check its row count, so a seeded-RNG change that shifts the output
    // (r14 inherited exactly that — the keyed breedPlan rewrite silently
    // moved the sf-fixture answer from 8 to 7 rows with both loops
    // spec-equal to EACH OTHER) is invisible unless the expected output is
    // COMMITTED. These literals are the sf0.001 fixture answer of the
    // registered query verbatim (same target doc, same Params incl. seed
    // 42); any change here is a semantic change to the attack query and
    // must be made CONSCIOUSLY by re-pinning, never discovered by the
    // driver's row-count drift.
    val out = graft.queries.Registry.queries("q_attack_invert")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq
    val expected = Seq(
      (1, 0.571429, "scmn"),
      (2, 0.505076, "window merge window merge"),
      (3, 0.466569, "uove1pt nbkp3xikn m7rgej aeo"),
      (4, 0.428571, "filte"),
      (5, 0.428571, "scanescoan"),
      (6, 0.428571, "thb09bqupq8amysf"),
      (7, 0.412393, "scan batch fillwkrwsca0n"),
      (8, 0.329914, "arkf jtlch srrtljoiz1sdplrjlswh"))
    assert(out == expected,
      s"q_attack_invert's seeded fixture output drifted:\n got $out")
  }
}
