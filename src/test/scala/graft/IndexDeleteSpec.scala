package graft

import graft.store.{GraphIndex, IvfIndex, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Delete/tombstone propagation across the three disk indexes — the
 * `Collection.deleteWhere` story (Chroma's `collection.delete`,
 * /root/reference/src/cod.py:92-139, drops rows from its HNSW index
 * transparently; these specs prove the same for IVF, graph, and text):
 *
 *  - a delete stops being served IMMEDIATELY (query-time anti-join);
 *  - `compact()` makes post-delete state equal a FRESH REBUILD without the
 *    deleted rows, physically;
 *  - replays are safe on both sides of the compaction boundary: an append
 *    replayed after an interim delete doesn't wedge the stream, and a
 *    delete replayed after compact cleared it cannot resurrect the
 *    tombstone against re-added rows (the hwm fence);
 *  - GraphIndex additionally repairs every live in-neighbor in the SAME
 *    commit, so no live edge ever points into a deleted node.
 */
class IndexDeleteSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("emb"))
    .persist()

  private def probeOf(id: Long): Array[Float] =
    vecs.filter(col("id") === id).head().getSeq[Float](1).toArray

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("id", "distance").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def batchDirs(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSeq

  // ---------------------------------------------------------------- IvfIndex

  test("IvfIndex: delete excludes immediately; compact equals a fresh rebuild") {
    val base = tmp("ivf_del")
    val idx = new IvfIndex(spark, base, numCells = 8)
    idx.build(vecs)
    val dead = Seq(3L, 7L, 11L)
    idx.delete(dead)

    // full-probe (nprobe = numCells) is EXACT top-k, so results must equal
    // a rebuild over the reduced corpus regardless of centroid placement
    val ref = new IvfIndex(spark, tmp("ivf_del_ref"), numCells = 8)
    ref.build(vecs.filter(!col("id").isin(dead: _*)))
    val qe = probeOf(3L) // probe AT a deleted vector — the sharpest case
    val got = ids(idx.query(qe, k = 10, nprobe = 8))
    assert(!got.exists(p => dead.contains(p._1)), "deleted ids must not be served")
    assert(got == ids(ref.query(qe, k = 10, nprobe = 8)),
      "post-delete full-probe query must equal a rebuild without the deleted rows")

    idx.compact()
    assert(ids(idx.query(qe, k = 10, nprobe = 8)) == got, "compact must not change answers")
    assert(spark.read.parquet(s"$base/data").filter(col("id").isin(dead: _*)).count() == 0,
      "compact must drop tombstoned rows physically")
    assert(batchDirs(s"$base/_tombstones").isEmpty,
      "compact must clear the applied tombstone dirs")
  }

  test("IvfIndex: append replay after an interim delete doesn't wedge; fresh re-adds still refuse") {
    val base = tmp("ivf_replay")
    val idx = new IvfIndex(spark, base, numCells = 4)
    idx.build(vecs.filter(col("id") < 100))
    val batch = vecs.filter(col("id") >= 100 && col("id") < 110)
    idx.appendBatch(batch, batchId = 0)
    idx.delete(Seq(100L, 101L))
    // the micro-batch is REPLAYED (its dir exists): must overwrite quietly,
    // and the delete still wins at query time
    idx.appendBatch(batch, batchId = 0)
    val got = ids(idx.query(probeOf(100L), k = 5, nprobe = 4)).map(_._1)
    assert(!got.contains(100L) && !got.contains(101L))
    // a FRESH batch re-adding a tombstoned id is a caller bug until compact
    intercept[IllegalArgumentException] {
      idx.appendBatch(vecs.filter(col("id") === 100L), batchId = 1)
    }
  }

  test("IvfIndex: a delete replayed after compact cannot resurrect the tombstone") {
    val base = tmp("ivf_fence")
    val idx = new IvfIndex(spark, base, numCells = 4)
    idx.build(vecs.filter(col("id") < 100))
    idx.deleteBatch(Seq(5L).toDF("id"), batchId = 0)
    idx.compact() // applies the delete physically, fences batch 0
    // id 5 is legitimately re-added after the compaction cleared it
    idx.appendBatch(vecs.filter(col("id") === 5L), batchId = 7)
    // the delete stream replays batch 0 (crash before its checkpoint
    // commit): fenced — a no-op, not a resurrection
    idx.deleteBatch(Seq(5L).toDF("id"), batchId = 0)
    assert(ids(idx.query(probeOf(5L), k = 3, nprobe = 4)).map(_._1).contains(5L),
      "re-added row must stay served after the fenced replay")
    idx.compact()
    assert(spark.read.parquet(s"$base/data").filter(col("id") === 5L).count() == 1,
      "the next compact must keep the re-added row")
  }

  test("IvfIndex: deleting ids never inserted is a no-op; a later fresh append of them sticks") {
    val base = tmp("ivf_unknown")
    val idx = new IvfIndex(spark, base, numCells = 4)
    idx.build(vecs.filter(col("id") <= 100))
    // 150 was NEVER indexed: an unknown-id tombstone would make the
    // later legitimate append refuse until a pointless compact
    idx.delete(Seq(150L, 3L)) // one unknown-to-the-index, one real
    assert(idx.query(probeOf(3L), k = 5, nprobe = 4)
      .filter(col("id") === 3L).count() == 0, "known id must be deleted")
    idx.append(vecs.filter(col("id") === 150L)) // must NOT throw
    assert(idx.query(probeOf(150L), k = 1, nprobe = 4).head().getLong(0) == 150L,
      "a fresh append of a never-present id must be served")
    idx.compact()
    assert(idx.query(probeOf(150L), k = 1, nprobe = 4).head().getLong(0) == 150L,
      "compact must NOT drop the appended row (no stale tombstone)")
  }

  test("IvfIndex: compact with tombstones but zero data batches sweeps them (no crash)") {
    val base = tmp("ivf_nobatch")
    val idx = new IvfIndex(spark, base, numCells = 4)
    idx.deleteBatch(Seq(1L, 2L).toDF("id"), batchId = 0)
    idx.compact() // the unguarded form threw UnsupportedOperationException here
    assert(batchDirs(s"$base/_tombstones").isEmpty)
    idx.build(vecs.filter(col("id") < 50)) // index still usable afterwards
    assert(ids(idx.query(probeOf(1L), k = 3, nprobe = 4)).nonEmpty)
  }

  // ---------------------------------------------------------------- TextIndex

  private def docs(pred: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$sf001/documents.parquet").select(col("doc_id"), col("text")).filter(pred)

  private def bm(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("doc_id", "bm25q").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("TextIndex: post-delete query is bit-equal to a rebuild without the docs; compact drops them") {
    val base = tmp("text_del")
    val idx = new TextIndex(spark, base, numBuckets = 8)
    idx.build(docs(lit(true)))
    val terms = Seq("data", "model", "query")
    val dead = bm(idx.query(terms, k = 3)).map(_._1) // delete the CURRENT top hits
    idx.delete(dead)

    val ref = new TextIndex(spark, tmp("text_del_ref"), numBuckets = 8)
    ref.build(docs(!col("doc_id").isin(dead: _*)))
    val got = bm(idx.query(terms, k = 10))
    assert(!got.exists(p => dead.contains(p._1)))
    // quantized integer scoring + corrected n/avgdl/df: BIT-equal, not close
    assert(got == bm(ref.query(terms, k = 10)),
      "post-delete scores must equal a fresh rebuild (stats corrected exactly)")

    idx.compact()
    assert(bm(idx.query(terms, k = 10)) == got, "compact must not change answers")
    assert(spark.read.parquet(s"$base/postings")
      .filter(col("doc_id").isin(dead: _*)).count() == 0,
      "compact must drop the tombstoned postings physically")
  }

  test("TextIndex: delete before build is harmless; compact survives; append replay doesn't wedge") {
    val base = tmp("text_nobatch")
    val idx = new TextIndex(spark, base, numBuckets = 4)
    idx.deleteBatch(Seq(1L).toDF("doc_id"), batchId = 0) // unknown ids: recorded empty
    idx.compact() // the unguarded form threw here
    idx.build(docs(col("doc_id") < 100))
    assert(bm(idx.query(Seq("data"), k = 5)).nonEmpty)

    // append, delete its docs, replay the append: must not throw
    val b = docs(col("doc_id") >= 100 && col("doc_id") < 110)
    idx.appendBatch(b, batchId = 3)
    idx.delete(Seq(100L, 101L))
    idx.appendBatch(b, batchId = 3)
    assert(!bm(idx.query(Seq("data"), k = 50)).map(_._1).exists(Seq(100L, 101L).contains))
  }

  test("TextIndex: a delete replayed after compact cannot drop re-added docs") {
    val base = tmp("text_fence")
    val idx = new TextIndex(spark, base, numBuckets = 4)
    idx.build(docs(col("doc_id") < 100))
    idx.deleteBatch(Seq(5L).toDF("doc_id"), batchId = 0)
    idx.compact()
    idx.appendBatch(docs(col("doc_id") === 5L), batchId = 7) // legitimate re-add
    idx.deleteBatch(Seq(5L).toDF("doc_id"), batchId = 0) // replay: fenced no-op
    idx.compact()
    assert(spark.read.parquet(s"$base/postings").filter(col("doc_id") === 5L).count() > 0,
      "re-added doc must survive the fenced replay and the next compact")
  }

  // ---------------------------------------------------------------- GraphIndex

  private val K = 4

  private def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 6).map { p =>
      when(graft.functions.VectorFunctions.dot(
        e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def newGraph(dir: String) =
    new GraphIndex(spark, dir, K, Seq(bucketOf(0) _, bucketOf(200) _))

  test("GraphIndex: delete repairs every live in-neighbor in the same commit") {
    val dir = tmp("gidx_del")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 200), refineRounds = 0)
    val g0 = idx.graph.persist()
    // delete a node that actually has in-neighbors (the interesting case)
    val dead = g0.groupBy("dst").count().orderBy(desc("count"), asc("dst"))
      .head().getLong(0)
    val inNbrs = g0.filter(col("dst") === dead).select("src")
      .collect().map(_.getLong(0)).toSet - dead
    val before = g0.filter(col("src").isin(inNbrs.toSeq: _*))
      .groupBy("src").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    g0.unpersist()

    idx.delete(Seq(dead))

    val g1 = idx.graph.persist()
    assert(g1.filter(col("dst") === dead).count() == 0,
      "no live edge may point into a deleted node")
    assert(g1.filter(col("src") === dead).count() == 0,
      "a deleted node's own edges must stop being served")
    assert(idx.vectors.filter(col("id") === dead).count() == 0)
    // REPAIR, not truncation: an in-neighbor that held k edges still holds
    // k (it lost one to the delete but was offered the deleted node's
    // out-neighbors as bridges)
    val after = g1.filter(col("src").isin(inNbrs.toSeq: _*))
      .groupBy("src").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    g1.unpersist()
    inNbrs.filter(before(_) == K).foreach { s =>
      assert(after(s) == K, s"in-neighbor $s was truncated ($K -> ${after(s)}), not repaired")
    }
    // serving: a probe at the deleted vector must not return it
    val got = idx.query(probeOf(dead), topK = 5, beamWidth = 8, hops = 3)
      .select("id").collect().map(_.getLong(0))
    assert(got.nonEmpty && !got.contains(dead))
  }

  test("GraphIndex: delete then insert use distinct epochs; compact fences replays") {
    val dir = tmp("gidx_fence")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 100), refineRounds = 0)
    val dead = 50L
    idx.deleteBatch(Seq(dead).toDF("id"), batchId = 0) // publishes graph epoch 1 (repairs)
    idx.insert(vecs.filter(col("id") > 100 && col("id") <= 120)) // must take epoch 2
    assert(new java.io.File(s"$dir/graph/epoch=1").exists() &&
      new java.io.File(s"$dir/graph/epoch=2").exists() &&
      new java.io.File(s"$dir/vectors/epoch=2").exists(),
      "a delete's repair epoch must never be overwritten by the next insert")
    assert(idx.graph.filter(col("dst") === dead || col("src") === dead).count() == 0,
      "no dangling edges after the subsequent insert")

    idx.compact()
    assert(spark.read.parquet(s"$dir/vectors").filter(col("id") === dead).count() == 0,
      "compact must drop the tombstoned vector physically")
    // replayed delete batch 0 is fenced; re-inserting the id must stick
    idx.deleteBatch(Seq(dead).toDF("id"), batchId = 0)
    idx.insert(vecs.filter(col("id") === dead))
    assert(idx.vectors.filter(col("id") === dead).count() == 1,
      "re-added id must be served after the fenced replay")
    assert(idx.graph.filter(col("src") === dead).count() > 0,
      "re-added id must be wired into the graph")
  }

  test("GraphIndex: deleting every entry point hands the slots to live neighbors") {
    val dir = tmp("gidx_entries")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 150), refineRounds = 0)
    val entryIds = idx.entryPoints.select("id").collect().map(_.getLong(0)).toSeq
    assert(entryIds.nonEmpty)
    idx.delete(entryIds) // every walk would otherwise start from a ghost
    val newEntries = idx.entryPoints.select("id").collect().map(_.getLong(0)).toSeq
    assert(newEntries.nonEmpty && newEntries.forall(id => !entryIds.contains(id)),
      "dead entries must be replaced by live neighbors in the same commit")
    val got = idx.query(probeOf(entryIds.head), topK = 5, beamWidth = 8, hops = 3)
      .select("id").collect().map(_.getLong(0))
    assert(got.nonEmpty, "queries must survive the deletion of every entry point")
    assert(got.forall(id => !entryIds.contains(id)))
  }

  test("GraphIndex: a replayed insert whose ids were deleted in the interim skips them") {
    val dir = tmp("gidx_replay")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 100), refineRounds = 0)
    val batch = vecs.filter(col("id") > 100 && col("id") <= 110)
    idx.insert(batch)
    idx.delete(Seq(105L))
    idx.insert(batch) // replay: 105 physically present (tombstoned) -> skipped
    assert(idx.vectors.filter(col("id") === 105L).count() == 0,
      "the delete must win over the replayed insert")
    assert(idx.graph.filter(col("dst") === 105L).count() == 0,
      "the replay must not re-wire edges into the deleted node")
  }

  test("GraphIndex: a delete publish interrupted between its swaps is finished at next open") {
    val dir = tmp("gidx_delcrash")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 100), refineRounds = 0)
    // stage both outputs of a deleteBatch(42, batch 0) and crash before
    // any rename: tombstones + repaired epoch must appear TOGETHER at open
    Seq(42L).toDF("id").write.mode("overwrite").parquet(s"$dir/__stage_tombstones_0")
    idx.graph.filter(col("src") === 1L).limit(1)
      .write.mode("overwrite").parquet(s"$dir/__stage_graph_9")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_commit"),
      (s"$dir/__stage_tombstones_0\t$dir/_tombstones/batch=0\n" +
       s"$dir/__stage_graph_9\t$dir/graph/epoch=9").getBytes("UTF-8"))
    val reopened = newGraph(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_commit")))
    assert(reopened.vectors.filter(col("id") === 42L).count() == 0,
      "recovered tombstone must be live")
    assert(reopened.graph.filter(col("src") === 1L).count() == 1,
      "recovered repair epoch must win resolution for its src")
  }
}
