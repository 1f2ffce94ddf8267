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

  test("zero-norm chunks: excluded from the index, invisible in every answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rag_zero").toString
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
