package graft

import graft.queries.{Registry, SearchQueries}
import graft.store.TextIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Disk inverted index: bucket pruning reaches the postings scan, results
  * agree with the in-memory BM25 scorer, and degenerate queries behave. */
class TextIndexSpec extends AnyFunSuite with SparkTest {

  private def freshIndex(buckets: Int = 8): TextIndex = {
    val base = java.nio.file.Files.createTempDirectory("graft_tidx_spec").toString
    val idx = new TextIndex(spark, base, buckets)
    idx.build(spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text"))
    idx
  }

  test("query is partition-pruned to the terms' buckets") {
    val idx = freshIndex()
    val hits = idx.query(SearchQueries.QueryTerms, 10)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket#") ||
      plan.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected bucket partition filters in:\n$plan")
    assert(hits.count() == 10)
  }

  test("index ranking equals the in-memory BM25 scorer (quantization-tight)") {
    val idx = freshIndex()
    val got = idx.query(SearchQueries.QueryTerms, 10).collect()
    val mem = Registry.queries("q_bm25")(spark, sf001).collect()
    assert(got.map(_.getLong(0)).toSeq == mem.map(_.getLong(0)).toSeq,
      "disk index must rank exactly like the in-memory scorer")
    // quantization error bound: 4 terms x 0.5/2^20 pre-round, then both
    // sides round to 4 decimals — scores agree within one last digit
    got.zip(mem).foreach { case (g, m) =>
      assert(math.abs(g.getDouble(2) - m.getDouble(2)) <= 1.001e-4,
        s"doc ${g.getLong(0)}: quantized ${g.getDouble(2)} vs exact ${m.getDouble(2)}")
    }
  }

  test("terms absent from the corpus yield an empty result, not an error") {
    val idx = freshIndex()
    assert(idx.query(Seq("zzzznotaword", "qqqqneither"), 5).collect().isEmpty)
  }

  test("single-bucket index still answers (degenerate pruning)") {
    val idx = freshIndex(buckets = 1)
    val got = idx.query(SearchQueries.QueryTerms, 10).collect()
    val mem = Registry.queries("q_bm25")(spark, sf001).collect()
    assert(got.map(_.getLong(0)).toSeq == mem.map(_.getLong(0)).toSeq)
  }
}
