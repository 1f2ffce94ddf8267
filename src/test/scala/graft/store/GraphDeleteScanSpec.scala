package graft.store

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The round-6 delete hardening, pinned by spec:
 *
 *  1. EMPTY rewritten edge sets are representable: a live src whose every
 *     edge points into the delete batch and which gains no bridges gets
 *     the [[GraphIndex.EmptyEdgeSentinel]] row, so epoch resolution can
 *     never resurrect its stale edges into deleted ids — the "no live
 *     edge points into a deleted node" invariant holds even for a node
 *     whose whole neighborhood died, and [[GraphIndex.compact]] never
 *     persists dangling edges.
 *  2. The large-batch fallback ([[GraphIndex.deleteScan]]) is fully
 *     DISTRIBUTED — no driver-side id list, no corpus-scale isin literal
 *     lists — and is answer-equivalent to the point-read path on the same
 *     fixture (both paths run against identical clones here).
 *  3. Ids never inserted are IGNORED (Chroma semantics): tombstoning them
 *     would swallow a later direct insert() at the next compact.
 *
 * Lives in package graft.store to reach the two private[store] paths
 * directly — the public dispatcher picks by batch size, and a
 * PointDeleteCap-sized batch is not a unit-testable fixture.
 */
class GraphDeleteScanSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("emb"))
    .persist()

  private def probeOf(id: Long): Array[Float] =
    vecs.filter(col("id") === id).head().getSeq[Float](1).toArray

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  private val K = 4

  private def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 6).map { p =>
      when(graft.functions.VectorFunctions.dot(
        e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def newGraph(dir: String) =
    new GraphIndex(spark, dir, K, Seq(bucketOf(0) _, bucketOf(200) _))

  private def edgeSet(idx: GraphIndex): Set[(Long, Long)] =
    idx.graph.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("scan path ≡ point-read path: same live graph, vectors, and entries") {
    val (dirP, dirS) = (tmp("gds_p"), tmp("gds_s"))
    val input = vecs.filter(col("id") <= 200)
    val (idxP, idxS) = (newGraph(dirP), newGraph(dirS))
    idxP.build(input, refineRounds = 0)
    idxS.build(input, refineRounds = 0)
    assert(edgeSet(idxP) == edgeSet(idxS), "builds are deterministic")

    // delete a third of the corpus, entry points included — the case the
    // fallback exists for, shrunk to fixture size
    val dead = (1L to 200L).filter(_ % 3 == 0)
    idxP.deletePointRead(dead.toDF("id"), batchId = 0)
    idxS.deleteScan(dead.toDF("id"), batchId = 0)

    assert(edgeSet(idxP) == edgeSet(idxS),
      "the two delete paths must produce identical live edge sets")
    assert(idxP.vectors.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      idxS.vectors.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(idxP.entryPoints.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      idxS.entryPoints.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "entry repair must agree across paths")
    // both serve, neither serves a deleted id
    Seq(idxP, idxS).foreach { idx =>
      val got = idx.query(probeOf(3L), topK = 5, beamWidth = 8, hops = 3)
        .select("id").collect().map(_.getLong(0))
      assert(got.nonEmpty && got.forall(id => !dead.contains(id)))
    }
  }

  test("a src whose whole neighborhood dies resolves to an EMPTY edge set, not stale edges") {
    for ((tag, run) <- Seq[(String, (GraphIndex, Seq[Long]) => Unit)](
        ("point", (i, d) => i.deletePointRead(d.toDF("id"), 0)),
        ("scan", (i, d) => i.deleteScan(d.toDF("id"), 0)))) {
      val dir = tmp(s"gds_empty_$tag")
      val idx = newGraph(dir)
      idx.build(vecs.filter(col("id") <= 200), refineRounds = 0)
      // orphan a node by deleting its ENTIRE out-neighborhood AND every
      // bridge candidate those neighbors offer (their own out-edges):
      // two hops of id 7's neighborhood, minus 7 itself
      val g0 = idx.graph.persist()
      val hop1 = g0.filter(col("src") === 7L).select("dst")
        .collect().map(_.getLong(0)).toSet
      val hop2 = g0.filter(col("src").isin(hop1.toSeq: _*)).select("dst")
        .collect().map(_.getLong(0)).toSet
      g0.unpersist()
      val dead = ((hop1 ++ hop2) - 7L).toSeq.sorted
      run(idx, dead)

      val g1 = idx.graph.persist()
      assert(g1.filter(col("dst").isin(dead: _*)).count() == 0,
        s"[$tag] stale edges into deleted ids survived epoch resolution")
      assert(g1.filter(col("src") === 7L).count() == 0,
        s"[$tag] the orphaned src must resolve to an empty edge set")
      assert(g1.filter(col("dst") === GraphIndex.EmptyEdgeSentinel).count() == 0,
        s"[$tag] sentinel rows must never be served")
      g1.unpersist()
      // the orphan's VECTOR is still live and still findable (brute-force
      // reachability through entries may fail for a true orphan, but it
      // must never be SERVED as a neighbor of deleted ghosts)
      assert(idx.vectors.filter(col("id") === 7L).count() == 1)

      // compact folds the orphan away physically and keeps zero dangling
      idx.compact()
      val raw = spark.read.parquet(s"$dir/graph")
      assert(raw.filter(col("dst").isin(dead: _*)).count() == 0,
        s"[$tag] compact persisted dangling edges")
      assert(raw.filter(col("dst") === GraphIndex.EmptyEdgeSentinel).count() == 0,
        s"[$tag] compact persisted sentinel rows")
      // post-compact, a fresh insert re-wires the orphan's neighborhood
      idx.insert(vecs.filter(col("id").isin(dead.take(5): _*)))
      assert(idx.graph.filter(col("src") === 7L).count() >= 0) // serving path healthy
      assert(idx.query(probeOf(7L), topK = 3, beamWidth = 8, hops = 3).count() > 0)
    }
  }

  test("deleting ids never inserted is a no-op; a later direct insert of them sticks") {
    val dir = tmp("gds_unknown")
    val idx = newGraph(dir)
    idx.build(vecs.filter(col("id") <= 100), refineRounds = 0)
    // 150 was NEVER inserted: deleting it must not write a tombstone that
    // would swallow the later insert at compact
    idx.delete(Seq(150L, 3L)) // one unknown, one real
    assert(idx.vectors.filter(col("id") === 3L).count() == 0, "known id deleted")
    idx.insert(vecs.filter(col("id") === 150L))
    assert(idx.vectors.filter(col("id") === 150L).count() == 1,
      "a direct insert of a never-present id must be served")
    idx.compact()
    assert(idx.vectors.filter(col("id") === 150L).count() == 1,
      "compact must NOT drop the inserted row (no stale tombstone)")
    assert(idx.vectors.filter(col("id") === 3L).count() == 0)
  }
}
