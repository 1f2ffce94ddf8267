package graft.store

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The single-writer lease (round-6 verdict item 2): a streaming
 * maintainer and a compactor can no longer interleave stage/swap
 * sequences on one store root — the loser fails CLEANLY (no stage
 * written), and a crashed holder's lease expires so recovery proceeds.
 */
class WriterLeaseSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  /** Acquire from a DIFFERENT thread — a foreign writer. (Same-thread
    * acquires are reentrant by design: a manually-held lease plus a
    * nested mutator call is one logical owner.) */
  private def foreignAcquire(root: String, op: String,
                             ttlMs: Long = WriterLease.DefaultTtlMs): WriterLease.Lease = {
    @volatile var l: WriterLease.Lease = null
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try l = WriterLease.acquire(root, op, ttlMs)
      catch { case e: Throwable => err = e }
    })
    t.start(); t.join()
    if (err != null) throw err
    l
  }

  test("two concurrent acquirers: exactly one wins, the loser fails cleanly") {
    val root = tmp("lease_race")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val ts = (1 to 2).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          val l = WriterLease.acquire(root, s"writer$i")
          results.add("won")
          Thread.sleep(50)
          l.release()
        } catch { case _: LeaseHeldException => results.add("held") }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val outcome = results.toArray(Array.empty[String]).toSeq.sorted
    assert(outcome == Seq("held", "won"), s"expected exactly one winner, got $outcome")
  }

  test("a mutator under a foreign lease fails before writing any stage; succeeds after release") {
    val dir = tmp("lease_idx")
    val idx = new IvfIndex(spark, dir, numCells = 4)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    idx.build(vecs)
    val foreign = foreignAcquire(dir, "streaming-maintainer")
    val before = Option(new java.io.File(dir).list()).get.toSet
    intercept[LeaseHeldException] { idx.delete(Seq(1L, 2L)) }
    intercept[LeaseHeldException] { idx.compact() }
    val after = Option(new java.io.File(dir).list()).get.toSet
    assert(before == after, "the losing writer must leave no stage or partial dir")
    foreign.release()
    idx.delete(Seq(1L, 2L)) // now clean
    assert(idx.query(vecs.filter(col("id") === 1L).head().getSeq[Float](1).toArray,
      k = 3, nprobe = 4).filter(col("id") === 1L).count() == 0)
  }

  test("reentrancy: routed Collection ops nest index ops without self-deadlock") {
    val base = tmp("lease_nest")
    val store = new VectorStore(spark, base)
    val col1 = store.createOrGet("c")
    val rows = (1 to 50).map(i => (s"id$i", s"doc $i", Map.empty[String, String],
      Array.tabulate(8)(j => (i * 31 + j).toFloat / 97f))).toDF("id", "doc", "meta", "emb")
    col1.add(rows)
    col1.attachIvfIndex(s"$base/__idx_c", numCells = 4, nprobe = 4)
    // add routes through the attached index (store lease + index lease,
    // different files); deleteWhere propagates the same way
    col1.add((51 to 60).map(i => (s"id$i", s"doc $i", Map.empty[String, String],
      Array.tabulate(8)(j => (i * 31 + j).toFloat / 97f))).toDF("id", "doc", "meta", "emb"))
    col1.deleteWhere(col("id") === "id51")
    assert(col1.df.filter(col("id") === "id51").count() == 0)
  }

  test("hammer: N threads x M cycles never observe two concurrent holders") {
    val root = tmp("lease_hammer")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 8).map { i =>
      new Thread(() => {
        (1 to 40).foreach { _ =>
          try {
            val l = WriterLease.acquire(root, s"w$i", ttlMs = 60000L)
            acquired.incrementAndGet()
            if (inside.incrementAndGet() != 1) violations.incrementAndGet()
            Thread.sleep(0, 50000)
            inside.decrementAndGet()
            l.release()
          } catch { case _: LeaseHeldException => () }
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(violations.get() == 0, s"${violations.get()} mutual-exclusion violations")
    assert(acquired.get() > 0, "hammer never acquired — test is vacuous")
    // the lease is free afterwards
    WriterLease.acquire(root, "after").release()
  }

  test("crash row: a dead holder's lease expires and the next writer takes over") {
    val root = tmp("lease_crash")
    // the holder 'crashes' (never releases) with a short TTL
    val dead = foreignAcquire(root, "crasher", ttlMs = 1L)
    Thread.sleep(10)
    // recovery: a new writer steals the expired lease and proceeds
    val l = WriterLease.acquire(root, "recoverer")
    assert(l.stillHeld())
    // the crashed holder must now refuse to publish
    intercept[LeaseLostException] { dead.assertHeld() }
    l.release()
  }

  test("an unexpired lease is not stolen; renew extends the TTL") {
    val root = tmp("lease_renew")
    val l = foreignAcquire(root, "holder", ttlMs = 60000L)
    intercept[LeaseHeldException] { WriterLease.acquire(root, "rival") }
    l.renew()
    assert(l.stillHeld())
    l.release()
    val l2 = WriterLease.acquire(root, "next")
    l2.release()
  }

  test("end-to-end: maintainer holds, compactor fails, maintainer crash-expires, compactor recovers") {
    val dir = tmp("lease_e2e")
    val docs = (1L to 200L).map(i => (i, s"term${i % 7} term${i % 13} body")).toDF("doc_id", "text")
    val idx = new TextIndex(spark, dir, numBuckets = 8)
    idx.build(docs)
    // while the maintainer's lease is LIVE the compactor loses cleanly
    val live = foreignAcquire(dir, "maintainer", ttlMs = 60000L)
    intercept[LeaseHeldException] { idx.compact() }
    live.release()
    // the maintainer re-acquires and CRASHES (never releases, tiny TTL)
    val crasher = foreignAcquire(dir, "maintainer", ttlMs = 1L)
    Thread.sleep(10)
    // recovery: the compactor steals the expired lease and proceeds
    idx.delete(Seq(1L))
    idx.compact()
    assert(spark.read.parquet(s"$dir/postings").filter(col("doc_id") === 1L).count() == 0,
      "compaction under the stolen lease must have applied the delete physically")
    intercept[LeaseLostException] { crasher.assertHeld() }
  }
}
