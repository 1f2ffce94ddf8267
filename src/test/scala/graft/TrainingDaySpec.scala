package graft

import graft.functions.{TextFunctions => TF}
import graft.queries.SearchQueries
import graft.streaming.TrainingDay
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The composed "training-data day" (r11 verdict stretch): streamed waves
 * pass the curation gate (quality + benchmark decontamination + exact-dup,
 * ONE checkpoint), the chunk index stays fresh with the standing panel's
 * depth policy written through, and the day closes with the near-dup band
 * compaction whose dropped docs' chunks tombstone out before the policy
 * re-persists. Serving must be EXACT at every checkpoint — during ingest
 * and after the close-of-day delete — and the final state must equal a
 * from-scratch batch rebuild over the survivor documents.
 */
class TrainingDaySpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    graft.store.Scratch.dir("graft_day")

  test("one training-data day: gated streamed ingest, write-through policy serving, close-of-day near-dup compaction — exact at every checkpoint") {
    val (w, st, dim) =
      (SearchQueries.RagWindow, SearchQueries.RagStride, SearchQueries.EmbDim)
    val kk = SearchQueries.RagChunkK + SearchQueries.RagCosMargin
    val allDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    // the benchmark: three docs whose 8-grams define contamination — the
    // gate must drop the docs themselves when they arrive in wave 2
    val benchIds = Seq(5L, 11L, 23L)
    val benchGrams = allDocs.filter(col("doc_id").isin(benchIds: _*))
      .select(explode(TF.shingleHashSet(TF.tokens(col("text")), 8)).as("g"))
      .distinct().collect().map(_.getLong(0))
    // planted near-dups: wave-0 docs re-arriving in wave 2 under NEW ids
    // with a suffixed text — a different exact fingerprint (the gate
    // passes them) but overlapping shingles (the close-of-day band gate
    // must drop the copies, never the originals)
    val plantedSrc = Seq(6L, 9L, 12L)
    val planted = allDocs.filter(col("doc_id").isin(plantedSrc: _*))
      .select((col("doc_id") + 50000L).as("doc_id"),
        concat(col("text"), lit(" near dup copy")).as("text"))
    val waves = Seq(
      allDocs.filter(col("doc_id") % 3 === 0),
      allDocs.filter(col("doc_id") % 3 === 1),
      allDocs.filter(col("doc_id") % 3 === 2).unionByName(planted))
    val probes = SearchQueries.ragProbePanel(spark)
    // the exact arm over any doc set: ragRanked against a scratch dir
    // holding exactly those documents (the StreamingSpec:971 oracle)
    def exactOver(docs: org.apache.spark.sql.DataFrame) = {
      val d = tmp()
      docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      SearchQueries.ragRanked(spark, d)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_chunks"), r.getAs[Double]("score"))).toSeq.sorted
    // the graph arm's exact twin: brute top-kk chunks by L2 per probe
    def keyedChunks0(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Percolate.chunkEmbed(d.select("doc_id", "text"), w, st, dim)
        .filter(graft.functions.VectorFunctions.norm(col("emb")) > 0)
        .select((shiftleft(col("doc_id"), 20) + col("chunk_id")).as("id"), col("emb"))
    // the graph arm serves its own panel contract: top-gk per probe at the
    // day's persisted beam widths (gk < kk — a graph panel's k is its own
    // knob, and chunk embeddings' duplicate cliques make deep exact recall
    // a density question, not a serving one)
    val gk = 5
    val gLadder = Seq(2, 4, 8, 16, 32, 64)
    def exactGraph(docs: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
      val chunks = keyedChunks0(docs).persist()
      val out = probes.flatMap { case (pid, qe) =>
        chunks.select(col("id"),
            graft.functions.VectorFunctions.l2Sq(col("emb"), typedlit(qe.toSeq)).as("dist"))
          .orderBy(asc("dist"), asc("id")).limit(gk)
          .collect().map(r => (pid, r.getLong(0), r.getDouble(1)))
      }.sorted
      chunks.unpersist()
      out
    }
    def graphServed(g: graft.store.GraphIndex): Seq[(Long, Long, Double)] =
      g.queryBatch(probes, gk, beamWidth = 1, hops = 6,
          beamOf = g.beamPolicy(probes, gk, gLadder))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    var checkpoints = 0
    val (idx, gidx, survivors, report) = TrainingDay.run(spark, waves,
      benchGrams, minQuality = 0.50, lateness = "10 minutes",
      standingProbes = probes, standingK = kk,
      numCells = 8, window = w, stride = st, dim = dim,
      onWave = (i, dayIdx, dayGraph, curated) => {
        checkpoints += 1
        // serving DURING the day routes through the persisted policy
        // (fresh — zero recalibration) and must equal the exact arm over
        // everything curated so far
        assert(dayIdx.depthPolicyStatus(probes, kk) == graft.store.IvfIndex.PolicyFresh,
          s"checkpoint $i: the committed policy must be FRESH")
        assert(rows(SearchQueries.ragServePersisted(spark, dayIdx)) ==
          rows(exactOver(curated)),
          s"checkpoint $i: policy-routed serving must equal the exact arm")
        // the graph arm under the same checkpoint: `_beams` fresh (every
        // insert/delete re-persisted it) and policy-routed walks recall
        // the exact top-kk over everything curated so far
        assert(dayGraph.beamPolicyStatus(probes, gk, gLadder) == graft.store.IvfIndex.PolicyFresh,
          s"checkpoint $i: the committed beam policy must be FRESH")
        assert(graphServed(dayGraph) == exactGraph(curated),
          s"checkpoint $i: beam-policy-routed graph serving must equal the exact arm")
      })
    assert(checkpoints == waves.length + 1,
      "a checkpoint per wave plus the close-of-day state")
    // gate accounting: every wave filtered something but kept most
    assert(report.arrived.length == waves.length &&
      report.accepted.length == waves.length)
    report.arrived.zip(report.accepted).zipWithIndex.foreach { case ((a, acc), i) =>
      assert(acc <= a && acc > 0, s"wave $i: arrived=$a accepted=$acc")
    }
    val survivorIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    // contamination: the benchmark docs arrived in wave 2 and were gated
    benchIds.foreach(b => assert(!survivorIds.contains(b),
      s"benchmark doc $b must be decontaminated at the gate"))
    // near-dups: the planted copies dropped at close of day, originals kept
    // (the copies' larger ids lose the band claim)
    assert(report.nearDupDropped >= plantedSrc.length.toLong,
      s"the ${plantedSrc.length} planted copies must drop (dropped=${report.nearDupDropped})")
    plantedSrc.foreach { src =>
      assert(!survivorIds.contains(src + 50000L), s"planted copy of $src must drop")
    }
    // the planted originals survive IF the band rule keeps them (they may
    // only drop to an organic smaller-id near-dup, never to their copy)
    assert(plantedSrc.count(survivorIds.contains) >= 2,
      "the planted originals must not be lost to their own copies")
    // the compaction is a FIXED POINT of the band rule: any two docs
    // sharing a band bucket resolve to the smaller id, so re-running the
    // gate over the survivors must find nothing left to drop
    assert(TrainingDay.bandDropped(survivors).isEmpty,
      "re-running the near-dup gate over the survivors must be a no-op")
    // the whole day ≡ a from-scratch batch rebuild over the survivors:
    // fresh index, fresh calibration — layouts differ, answers must not
    def keyedChunks(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Percolate.chunkEmbed(d.select("doc_id", "text"), w, st, dim)
        .filter(graft.functions.VectorFunctions.norm(col("emb")) > 0)
        .select((shiftleft(col("doc_id"), 20) + col("chunk_id")).as("id"), col("emb"))
    val rebuilt = new graft.store.IvfIndex(spark, tmp(), numCells = 8)
    rebuilt.build(keyedChunks(survivors))
    rebuilt.persistDepthPolicy(probes, kk)
    assert(rows(SearchQueries.ragServePersisted(spark, idx)) ==
      rows(SearchQueries.ragServePersisted(spark, rebuilt)),
      "the streamed+compacted day must serve like the batch rebuild")
    // live chunk accounting: the index serves exactly the survivors' chunks
    assert(report.liveChunks == keyedChunks(survivors).count(),
      "tombstoned chunks must not count as live")
    // the GRAPH day ≡ exact over the survivors (insert/delete/repair under
    // the beam fence composed to the same answers a fresh graph gives —
    // both arms are policy-calibrated to exactness, so equality is through
    // the exact twin, layout-independent)
    assert(graphServed(gidx) == exactGraph(survivors),
      "the maintained graph must serve the survivor corpus exactly")
  }
}
