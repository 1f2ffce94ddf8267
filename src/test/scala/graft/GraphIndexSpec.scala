package graft

import graft.functions.{VectorFunctions => VF}
import graft.store.GraphIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphIndexSpec extends AnyFunSuite with SparkTest {

  private val K = 4

  private def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 6).map { p =>
      when(VF.dot(e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private lazy val all = spark.read.parquet(s"$sf001/embeddings.parquet")
    .filter(col("vec_id") =!= 0)
    .select(col("vec_id").as("id"), col("embedding").as("emb"))
    .persist()

  private lazy val probe = spark.read.parquet(s"$sf001/embeddings.parquet")
    .filter(col("vec_id") === 0).head().getSeq[Float](1).toArray

  test("persisted graph answers like the in-memory build; shape invariants hold") {
    val idx = new GraphIndex(spark, java.nio.file.Files.createTempDirectory("graft_gidx").toString,
      K, Seq(bucketOf(0) _, bucketOf(200) _))
    idx.build(all, refineRounds = 1)
    val g = idx.graph
    assert(g.filter(col("src") === col("dst")).count() == 0)
    assert(g.groupBy("src").count().agg(max("count")).head().getLong(0) <= K)
    val got = idx.query(probe, topK = 5, beamWidth = 4, hops = 6, entries = Seq(1L, 2L))
      .collect()
    assert(got.length == 5)
    assert(got.map(_.getDouble(1)).toSeq == got.map(_.getDouble(1)).sorted.toSeq)
  }

  test("incremental insert wires new nodes in both directions; answers track a rebuild") {
    val n = all.count()
    val half = all.filter(col("id") % 2 === 0)
    val rest = all.filter(col("id") % 2 =!= 0)
    val idx = new GraphIndex(spark, java.nio.file.Files.createTempDirectory("graft_gidx_inc").toString,
      K, Seq(bucketOf(0) _, bucketOf(200) _))
    idx.build(half, refineRounds = 1)
    val (b1, b2) = (rest.filter(col("id") % 4 === 1), rest.filter(col("id") % 4 === 3))
    idx.insert(b1)
    idx.insert(b1) // at-least-once replay: already-indexed ids are skipped
    idx.insert(b2)
    assert(idx.vectors.count() == n,
      "all vectors present exactly once after inserts incl. a replayed batch")
    assert(idx.vectors.select("id").distinct().count() == n)
    val g = idx.graph.persist()
    // shape invariants survive incremental maintenance
    assert(g.filter(col("src") === col("dst")).count() == 0)
    assert(g.groupBy("src").count().agg(max("count")).head().getLong(0) <= K)
    // every inserted node has out-edges AND is reachable (some in-edge)
    val newIds = rest.select(col("id")).persist()
    val noOut = newIds.join(g.select(col("src").as("id")).distinct(), Seq("id"), "left_anti").count()
    val noIn = newIds.join(g.select(col("dst").as("id")).distinct(), Seq("id"), "left_anti").count()
    assert(noOut == 0, s"$noOut inserted nodes have no out-edges")
    assert(noIn < newIds.count() / 4,
      s"$noIn of ${newIds.count()} inserted nodes unreachable — reverse wiring failed")
    // query quality tracks a from-scratch rebuild on the full data
    val rebuilt = new GraphIndex(spark, java.nio.file.Files.createTempDirectory("graft_gidx_rb").toString,
      K, Seq(bucketOf(0) _, bucketOf(200) _))
    rebuilt.build(all, refineRounds = 1)
    def best(ix: GraphIndex): Double =
      ix.query(probe, topK = 5, beamWidth = 4, hops = 6, entries = Seq(2L, 4L))
        .collect().head.getDouble(1)
    val (bInc, bRb) = (best(idx), best(rebuilt))
    info(f"beam best dist: incremental=$bInc%.4f rebuild=$bRb%.4f")
    assert(bInc <= bRb * 1.25,
      s"incrementally-maintained graph answers degraded: $bInc vs rebuild $bRb")
    // inserted nodes are FINDABLE: probing with an inserted vector's own
    // embedding from old-graph entries must navigate well below the
    // corpus-median distance (exact self-hit is not guaranteed by beam
    // search in a near-uniform space — navigation quality is the claim)
    val target = rest.orderBy("id").limit(1).head()
    val te = target.getSeq[Float](1).toArray
    val hit = idx.query(te, topK = 1, beamWidth = 4, hops = 8, entries = Seq(2L, 4L))
      .collect().head
    val median = all.withColumn("d", VF.l2Sq(col("emb"), typedlit(te)))
      .stat.approxQuantile("d", Array(0.5), 0.001).head
    info(f"probe-inserted-vector beam best=${hit.getDouble(1)}%.4f median=$median%.4f")
    assert(hit.getDouble(1) < median,
      s"beam should navigate below the median distance ${median}, got ${hit.getDouble(1)}")
  }
}
