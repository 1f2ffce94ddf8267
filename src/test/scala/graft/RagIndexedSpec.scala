package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Index-routed RAG retrieval (q_rag_indexed): the persisted-chunk-index
 * serving arm must return EXACTLY the exact arm's answer — at the
 * self-calibrated probe depth (the sweep measured that depth as exact
 * for these probes) and, a fortiori, at full depth. The zero-norm chunk
 * exclusion (token-less windows never enter the index) must be
 * answer-invisible: a zero vector's cosine is the -1.0 sentinel, below
 * any real chunk, but its L2 distance to a unit probe is 1.0 — mid-pack
 * — which is exactly why it must not reach the L2 shortlist.
 */
class RagIndexedSpec extends AnyFunSuite with SparkTest {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Long, Long, Double)] =
    df.collect().map(r => (
      r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("chunk_id"), r.getAs[Long]("n_chunks"),
      r.getAs[Double]("score"))).toSeq.sorted

  test("indexed arm == exact arm, at the calibrated depth and at full depth") {
    val exact = rows(SearchQueries.ragRanked(spark, sf0001))
    assert(exact.nonEmpty, "fixture sanity: the exact arm retrieves")
    val calibrated = rows(SearchQueries.ragRankedIndexed(spark, sf0001))
    val full = rows(SearchQueries.ragRankedIndexed(spark, sf0001,
      forceDepth = Some(512))) // ≥ the adaptive cell cap: every cell probed
    assert(full == exact,
      "full-depth routed serving must equal the exact corpus scan")
    assert(calibrated == exact,
      "the calibrated depth was MEASURED exact for these probes — same answer")
  }

  test("persisted depth policy: reopen serves with zero recalibration; appends fence it stale; rebuild sweeps it") {
    val kk = SearchQueries.RagChunkK + SearchQueries.RagCosMargin
    val idx = SearchQueries.ragBuildIndex(spark, sf0001)
    val probes = SearchQueries.ragProbePanel(spark)
    val depths = SearchQueries.ragCalibrate(idx, probes) // persists + reads back
    assert(idx.depthPolicyStatus(probes, kk) == graft.store.IvfIndex.PolicyFresh)
    // REOPEN: a fresh instance over the same path (a serving process)
    // reads the committed depths — no calibration jobs — and serves the
    // exact arm's answer
    val reopened = new graft.store.IvfIndex(spark, idx.path, idx.numCells)
    assert(reopened.depthPolicy(probes, kk) == depths,
      "reopen must read back exactly the calibrated per-probe depths")
    val exact = rows(SearchQueries.ragRanked(spark, sf0001))
    assert(rows(SearchQueries.ragServePersisted(spark, reopened)) == exact,
      "policy-routed serving across a reopen must equal the exact arm")
    // a policy is for EXACTLY its (panel, k): another k reads as absent
    assert(reopened.depthPolicyStatus(probes, kk + 1) == graft.store.IvfIndex.PolicyAbsent)
    assert(reopened.depthPolicyStatus(probes.tail, kk) == graft.store.IvfIndex.PolicyAbsent)
    // APPEND past the calibration: the fence trips — the strict route
    // REFUSES (stale depths must never serve silently)...
    val extra = spark.read.parquet(s"$sf0001/documents.parquet")
      .select((col("doc_id") + 50000L).as("doc_id"), col("text")).limit(8)
    val newChunks = graft.operators.Percolate
      .chunkEmbed(extra, SearchQueries.RagWindow, SearchQueries.RagStride,
        SearchQueries.EmbDim)
      .filter(graft.functions.VectorFunctions.norm(col("emb")) > 0)
      .select((shiftleft(col("doc_id"), 20) + col("chunk_id")).as("id"), col("emb"))
    reopened.appendBatch(newChunks, 1L)
    assert(reopened.depthPolicyStatus(probes, kk) == graft.store.IvfIndex.PolicyStale)
    val ex = intercept[RuntimeException](reopened.depthPolicy(probes, kk))
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // ...and the self-healing route recalibrates LOUDLY and serves the
    // exact answer over the GROWN corpus (ragServePersisted's path)
    val healed = reopened.depthPolicyOrRecalibrate(probes, kk)
    assert(reopened.depthPolicyStatus(probes, kk) == graft.store.IvfIndex.PolicyFresh,
      "self-healing must re-persist a fresh policy")
    // serving at the healed policy equals serving at a freshly computed
    // calibration over the grown corpus (exactDepths' own exactness —
    // depth-at-target after appends — is pinned in IvfIndexSpec and the
    // StreamingSpec maintenance scenario; here the claim is that the
    // SIDECAR route hands back exactly that fresh map)
    assert(rows(SearchQueries.ragServeIndexed(spark, reopened, probes, healed)) ==
      rows(SearchQueries.ragServeIndexed(spark, reopened, probes,
        reopened.exactDepths(probes, kk))),
      "healed policy must serve exactly like a fresh calibration")
    // REBUILD sweeps the sidecar outright (depths for the old layout say
    // nothing about the new one): policy reads as absent afterwards
    reopened.retrain()
    assert(reopened.depthPolicyStatus(probes, kk) == graft.store.IvfIndex.PolicyAbsent,
      "a rebuild must sweep the persisted policy")
  }

  test("zero-norm chunks: excluded from the index, invisible in every answer") {
    val dir = graft.store.Scratch.dir("graft_rag_zero")
    // 60 real docs plus one empty-text doc: its only chunk hash-embeds to
    // the zero vector (no tokens), which the exact arm scores at the
    // cosine -1.0 sentinel and the index build drops entirely
    import spark.implicits._
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(60)
    real.union(Seq((999L, "")).toDF("doc_id", "text"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val exact = rows(SearchQueries.ragRanked(spark, dir))
    val routed = rows(SearchQueries.ragRankedIndexed(spark, dir))
    assert(routed == exact, "zero-norm exclusion must not change the answer")
    assert(!exact.exists(_._3 == 999L),
      "a token-less document can never outrank a real chunk")
  }
}
