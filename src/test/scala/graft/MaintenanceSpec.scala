package graft

import graft.store.{TextIndex, VectorStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Auto-compaction policy (`Collection.maintain`) and the [[graft.store.IndexStats]]
 * introspection it decides on: pending-tombstone ratio and publish-unit
 * count trigger a compaction; answers never change (compact ≡ rebuild is
 * pinned by IndexDeleteSpec — here we pin the POLICY takes effect and is
 * idempotent).
 */
class MaintenanceSpec extends AnyFunSuite with SparkTest {

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  private lazy val rows = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").cast("string").as("id"),
      concat(lit("doc "), col("vec_id")).as("doc"),
      map(lit("label"), col("label").cast("string")).as("meta"),
      col("embedding").as("emb"))

  private lazy val probe = spark.read.parquet(s"$sf001/embeddings.parquet")
    .filter(col("vec_id") === 17).head().getAs[Seq[Float]]("embedding").toArray

  test("pending-delete ratio triggers IVF compaction; stats and answers hold") {
    val store = new VectorStore(spark, tmp("vs_mnt"))
    val c = store.createOrGet("col")
    c.add(rows)
    c.attachIvfIndex(tmp("vs_mnt_idx"), numCells = 8, nprobe = 8)
    val st0 = c.indexStats().get
    assert(st0.pendingDeletes == 0L && st0.liveRows > 0)
    assert(!c.maintain(), "clean index must not trigger maintenance")

    // delete ~a third of the rows -> ratio crosses the 0.2 default
    c.deleteWhere(col("id").cast("long") % 3 === 0)
    val st1 = c.indexStats().get
    assert(st1.pendingDeletes > 0, "deleteWhere must land index tombstones")
    assert(st1.pendingRatio > 0.2, s"ratio ${st1.pendingRatio} should exceed 0.2")
    val before = c.query(probe, k = 5).collect().map(_.getString(0)).toSeq

    assert(c.maintain(), "over-ratio index must compact")
    val st2 = c.indexStats().get
    assert(st2.pendingDeletes == 0L, "compaction must purge pending deletes")
    assert(st2.liveRows == st1.liveRows, "live rows unchanged by compaction")
    assert(!c.maintain(), "maintenance must be idempotent once clean")
    val after = c.query(probe, k = 5).collect().map(_.getString(0)).toSeq
    assert(after == before, "maintenance must not change answers")
  }

  test("publish-unit growth triggers graph compaction") {
    val store = new VectorStore(spark, tmp("vs_mntg"))
    val c = store.createOrGet("col")
    val base = rows.filter(col("id").cast("long") < 150)
    c.add(base)
    def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 6).map { p =>
        when(graft.functions.VectorFunctions.dot(
          e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    c.attachGraphIndex(tmp("vs_mntg_idx"), k = 4,
      Seq(bucketOf(0) _, bucketOf(200) _), beamWidth = 8, hops = 3)
    // three delta inserts -> 4 publish units
    (0 until 3).foreach { i =>
      c.add(rows.filter(col("id").cast("long") >= 150 + i * 20 &&
        col("id").cast("long") < 170 + i * 20))
    }
    val st = c.indexStats().get
    assert(st.units >= 4, s"expected >=4 publish units, saw ${st.units}")
    val before = c.query(probe, k = 5).collect().map(_.getString(0)).toSeq
    assert(c.maintain(maxUnits = 2), "unit overflow must compact")
    assert(c.indexStats().get.units == 1, "compaction folds to one unit")
    assert(c.query(probe, k = 5).collect().map(_.getString(0)).toSeq == before,
      "maintenance must not change answers")
  }

  test("drift flood trips the cell-geometry trigger: maintain retrains, answers hold") {
    val store = new VectorStore(spark, tmp("vs_rt"))
    val c = store.createOrGet("col")
    c.add(rows.filter(col("id").cast("long") < 300))
    val idx = c.attachIvfIndex(tmp("vs_rt_idx"), numCells = 8, nprobe = 8)
    assert(!c.maintain(), "clean index must not trigger maintenance")

    // drift flood through the ROUTED add (keeps the index in sync): far
    // outside the build-time grid and piled into the shift direction
    val flood = rows.filter(col("id").cast("long") >= 300 && col("id").cast("long") < 700)
      .withColumn("id", concat(lit("drift-"), col("id")))
      .withColumn("emb", transform(col("emb"), x => (x + lit(4.0f)).cast("float")))
    c.add(flood)
    val bal1 = idx.balance()
    assert(bal1.sq8ClipRate > 0.1, s"flood should clip codes, got ${bal1.sq8ClipRate}")
    val before = c.query(probe, k = 5).collect().map(_.getString(0)).toSeq

    assert(c.maintain(), "clip-rate breach must trigger a retrain")
    val bal2 = idx.balance()
    assert(bal2.sq8ClipRate == 0.0 && bal2.liveRows == bal1.liveRows,
      s"retrain re-freezes the grid over live rows: $bal2")
    assert(bal2.maxOverMean <= bal1.maxOverMean,
      s"retrain must not worsen skew: ${bal1.maxOverMean} -> ${bal2.maxOverMean}")
    assert(c.query(probe, k = 5).collect().map(_.getString(0)).toSeq == before,
      "maintenance must not change answers (full-probe ≡ brute force)")
    assert(!c.maintain(), "maintenance must be idempotent once rebalanced")
  }

  test("PQ reconstruction-error breach triggers retrain via maintain") {
    val store = new VectorStore(spark, tmp("vs_pqrt"))
    val c = store.createOrGet("col")
    c.add(rows.filter(col("id").cast("long") < 300))
    val idx = c.attachIvfIndex(tmp("vs_pqrt_idx"), numCells = 8, nprobe = 8,
      codes = "pq", pqM = 8)
    assert(!c.maintain(), "clean pq index must not trigger maintenance")
    val flood = rows.filter(col("id").cast("long") >= 300 && col("id").cast("long") < 700)
      .withColumn("id", concat(lit("drift-"), col("id")))
      .withColumn("emb", transform(col("emb"), x => (x + lit(4.0f)).cast("float")))
    c.add(flood)
    assert(idx.balance().pqErrRatio > 2.0)
    val before = c.query(probe, k = 5).collect().map(_.getString(0)).toSeq
    assert(c.maintain(), "reconstruction-error breach must trigger a retrain")
    assert(idx.balance().pqErrRatio < 1.5, "retrain re-fits the codebooks")
    assert(c.query(probe, k = 5).collect().map(_.getString(0)).toSeq == before,
      "maintenance must not change answers")
    assert(!c.maintain(), "idempotent once re-fitted")
  }

  test("TextIndex.stats reflects deletes and compaction") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idx = new TextIndex(spark, tmp("tidx_mnt"), numBuckets = 4)
    idx.build(docs)
    val st0 = idx.stats()
    assert(st0.liveRows == docs.count() && st0.pendingDeletes == 0)
    idx.delete(Seq(1L, 2L, 3L))
    val st1 = idx.stats()
    assert(st1.pendingDeletes == 3 && st1.liveRows == st0.liveRows - 3)
    idx.compact()
    val st2 = idx.stats()
    assert(st2.pendingDeletes == 0 && st2.liveRows == st0.liveRows - 3)
  }
}
