package graft

import graft.store.{GraphIndex, VectorStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-6 verdict item 3 (snapshot attached indexes) and ADVICE item 5
 * (add/index atomicity recovery):
 *
 *  - `snapshot(tag)` pins an attached index's exact epoch set, tombstone
 *    batches, and entry points (hardlinked tree + routing manifest);
 *    `querySnapshot` serves the frozen view BIT-FOR-BIT however the live
 *    collection mutates afterwards (adds, deletes, compactions).
 *  - `attach` reconciles a crash between the store append and the index
 *    append: rows durable in the store but missing from the index are
 *    inserted at attach time (the store is authoritative).
 */
class SnapshotIndexSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  // 64-dim: AnnQueries.plane's width (the graph test's LSH bucketing)
  private def rowsOf(r: Range) = r.map(i => (s"id$i", s"doc $i",
    Map.empty[String, String],
    Array.tabulate(64)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)))
    .toDF("id", "doc", "meta", "emb")

  private def probe(i: Int): Array[Float] =
    Array.tabulate(64)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)

  private def answers(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double)] =
    df.select("id", "doc", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq

  test("IVF snapshot: mutations after the snapshot cannot change its answers") {
    val base = tmp("snap_ivf")
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("c")
    c.add(rowsOf(1 to 200))
    c.attachIvfIndex(s"$base/__idx", numCells = 4, nprobe = 4)
    val before = answers(c.query(probe(7), k = 10))
    c.snapshot("s1")

    // mutate hard: delete served rows, add new ones, compact the index
    c.deleteWhere(col("id").isin((1 to 50).map(i => s"id$i"): _*))
    c.add(rowsOf(201 to 300))
    val live = answers(c.query(probe(7), k = 10))
    assert(live != before, "sanity: the live view must have moved")

    val snap = answers(c.querySnapshot("s1", probe(7), k = 10))
    assert(snap == before,
      "snapshot query must equal the pre-mutation routed query bit-for-bit")

    // RESTORE: promote the snapshot back to live — rows AND index tree
    c.restoreSnapshot("s1")
    assert(answers(c.query(probe(7), k = 10)) == before,
      "restored routed query must equal the pre-mutation answers")
    assert(c.count() == 200, "restore must bring back the snapshot row set")
    assert(c.get(ids = Seq("id30")).count() == 1, "deleted row returns after restore")
    assert(c.get(ids = Seq("id250")).count() == 0, "post-snapshot row gone after restore")
    assert(c.indexStats().get.pendingDeletes == 0,
      "restored index must carry the snapshot's clean tombstone state")
    // restore is repeatable and the snapshot survives it
    c.restoreSnapshot("s1")
    assert(answers(c.query(probe(7), k = 10)) == before)
    assert(answers(c.querySnapshot("s1", probe(7), k = 10)) == before,
      "the snapshot itself must be untouched by restores")
    // and the restored collection accepts new writes
    c.add(rowsOf(500 to 510))
    assert(c.count() == 211)
  }

  test("graph snapshot: pinned epochs and tombstones survive delete + compact") {
    val base = tmp("snap_graph")
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("g")
    c.add(rowsOf(1 to 200))
    val bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      e => (0 until 4).map { p =>
        when(graft.functions.VectorFunctions.dot(
          e, typedlit(graft.queries.AnnQueries.plane(p))) >= 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val idx = c.attachGraphIndex(s"$base/__gidx", k = 4, bucketFns = Seq(bucket),
      beamWidth = 8, hops = 3, refineRounds = 0)
    // leave a delete PENDING (tombstone batch, repair epoch) before the
    // snapshot — the frozen view must carry both
    c.deleteWhere(col("id") === "id5")
    val before = answers(c.query(probe(5), k = 8))
    assert(!before.exists(_._1 == "id5"))
    c.snapshot("s1")

    // post-snapshot: compact the index (folds epochs, clears tombstones),
    // delete more, add more
    idx.compact()
    c.deleteWhere(col("id").isin((10 to 40).map(i => s"id$i"): _*))
    c.add(rowsOf(201 to 260))
    val live = answers(c.query(probe(5), k = 8))
    assert(live != before, "sanity: the live view must have moved")

    val snap = answers(c.querySnapshot("s1", probe(5), k = 8))
    assert(snap == before,
      "graph snapshot must pin epoch set + tombstones + entries bit-for-bit")
    assert(!snap.exists(_._1 == "id5"),
      "the pre-snapshot pending delete must hold inside the snapshot")
  }

  test("snapshot without an index falls back to brute force over the frozen rows") {
    val base = tmp("snap_plain")
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("p")
    c.add(rowsOf(1 to 100))
    val before = answers(c.query(probe(3), k = 5))
    c.snapshot("s1")
    c.deleteWhere(col("id") === before.head._1)
    assert(answers(c.querySnapshot("s1", probe(3), k = 5)) == before)
  }

  test("attach reconciles rows a crashed add left out of the index (store is authoritative)") {
    val base = tmp("snap_reconcile")
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("r")
    c.add(rowsOf(1 to 150))
    val idx = c.attachIvfIndex(s"$base/__idx", numCells = 4, nprobe = 4)
    // simulate the crash window of add(): rows land in the STORE while the
    // index append never happens (write directly, bypassing routing)
    c.detachIndex()
    c.add(rowsOf(151 to 170))
    // the index serves a stale view now; re-attach must heal it
    c.attach(VectorStore.AttachedIvf(idx, nprobe = 4))
    val got = answers(c.query(probe(160), k = 3))
    assert(got.exists(_._1 == "id160"),
      "rows present in the store must be served after re-attach")
  }
}
