package graft

import graft.store.{EncryptedGraph, GraphIndex, IvfIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Encrypted graph serving twin: the SHARED GraphWalk schedule over a
 * ciphertext corpus must serve the plaintext GraphIndex's answers beam for
 * beam; nothing semantic lands in the clear; the persisted beam policy is
 * fenced by rebuilds AND key rotation (contentFp over the ciphertext
 * trees); the per-probe policy routes through `beamOf`.
 */
class EncryptedGraphSpec extends AnyFunSuite with SparkTest {

  private val Key = "0123456789abcdef"
  private val Key2 = "fedcba9876543210"
  private def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.{VectorFunctions => VF}
    (0 until 6).map { p =>
      when(VF.dot(e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }
  private def bucketFns: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
    Seq(bucketOf(0) _, bucketOf(200) _)

  private def corpus() = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .filter(col("vec_id") =!= 0)
    .select(col("vec_id").as("id"),
      concat(lit("doc for vector "), col("vec_id")).as("doc"),
      col("embedding").as("emb"))

  private def probePanel(n: Int): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(n)
      .collect().map(r => (r.getLong(0) + 5000L,
        r.getSeq[Float](1).toArray)).toSeq

  test("encrypted walk == plaintext GraphIndex walk beam for beam; docs decrypt answer-bounded; nothing semantic at rest") {
    val c = corpus().persist()
    val gi = new GraphIndex(spark,
      graft.store.Scratch.dir("graft_encg_plain"),
      k = 4, bucketFns)
    gi.build(c.select("id", "emb"), refineRounds = 1)
    val egPath = graft.store.Scratch.dir("graft_encg_ct")
    val eg = new EncryptedGraph(spark, egPath, Key)
    eg.build(c, k = 4, bucketFns, refineRounds = 1)
    val panel = probePanel(8)
    // same medoid entries from the same deterministic trainer — compare
    // the walks at the DEFAULT entries of each (must coincide)
    assert(eg.defaultEntries() ==
      gi.entryPoints.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq,
      "the shared medoid trainer must seed both twins identically")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "id", "dist", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    val plain = rows(gi.queryBatch(panel, topK = 5, beamWidth = 4, hops = 4))
    assert(plain.nonEmpty, "fixture sanity")
    assert(rows(eg.queryBatch(panel, topK = 5, beamWidth = 4, hops = 4)) == plain,
      "ciphertext walk must serve the plaintext walk's exact answers")
    // answer docs decrypt answer-bounded and roundtrip exactly
    val withDocs = eg.queryBatch(panel.take(2), topK = 3, beamWidth = 4,
      hops = 4, includeDoc = true).collect()
    assert(withDocs.nonEmpty &&
      withDocs.forall(r => r.getString(4) == s"doc for vector ${r.getLong(1)}"),
      "answer doc payloads must decrypt to the stored documents")
    // at rest: the vector tree carries ONLY (id, doc_ct, emb_ct) — no
    // plaintext embedding or document column exists to scan
    val atRest = spark.read.parquet(s"$egPath/vectors")
    assert(atRest.columns.sorted.toSeq == Seq("doc_ct", "emb_ct", "id"))
    assert(atRest.schema("emb_ct").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // a wrong key cannot read the corpus (AES-GCM authenticates)
    val wrong = new EncryptedGraph(spark, egPath, Key2)
    intercept[Exception](
      wrong.queryBatch(panel.take(1), 3, 4, 2).collect())
    c.unpersist()
  }

  test("frame-probe route == Seq route probe for probe; beam policy routes through the frame; doc decrypt answer-bounded") {
    val c = corpus().persist()
    val egPath = graft.store.Scratch.dir("graft_encg_df")
    val eg = new EncryptedGraph(spark, egPath, Key)
    eg.build(c, k = 4, bucketFns, refineRounds = 1)
    val panel = probePanel(8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "id", "dist", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    val panelDf = spark.createDataFrame(
      panel.map { case (pid, qe) => (pid, qe.toSeq) }).toDF("probe_id", "qe")
    val seqRoute = rows(eg.queryBatch(panel, topK = 5, beamWidth = 4, hops = 4))
    assert(seqRoute.nonEmpty, "fixture sanity")
    assert(rows(eg.queryBatchDF(panelDf, topK = 5, beamWidth = 4, hops = 4)) == seqRoute,
      "the ciphertext frame walk must serve the Seq route's exact answers")
    // the persisted beam policy routes through the frame's `beam` column
    // exactly like the Seq route's beamOf map
    val beams = eg.persistBeamPolicy(panel, 5)
    val withBeam = panelDf.withColumn("beam",
      element_at(typedlit(beams), col("probe_id")))
    assert(rows(eg.queryBatchDF(withBeam, 5, beamWidth = 1, hops = 6, useBeam = true)) ==
      rows(eg.queryBatch(panel, 5, beamWidth = 1, hops = 6, beamOf = beams)),
      "the frame-routed beam policy must walk identically to beamOf")
    // non-integral beam column refuses loudly (a cast-nulled width would
    // silently change recall)
    val eBad = intercept[IllegalArgumentException](
      eg.queryBatchDF(panelDf.withColumn("beam", lit(2.5)), 5, 4, 4, useBeam = true))
    assert(eBad.getMessage.contains("integral"))
    // duplicate probe ids refuse loudly through the shared walk guard
    val eDup = intercept[IllegalArgumentException](
      eg.queryBatchDF(panelDf.unionByName(panelDf.limit(1)), 5, 4, 4).count())
    assert(eDup.getMessage.contains("duplicate probe_id"))
    // answer docs decrypt answer-bounded and roundtrip exactly
    val withDocs = eg.queryBatchDF(panelDf.limit(2), topK = 3, beamWidth = 4,
      hops = 4, includeDoc = true).collect()
    assert(withDocs.nonEmpty &&
      withDocs.forall(r => r.getString(4) == s"doc for vector ${r.getLong(1)}"),
      "answer doc payloads must decrypt to the stored documents")
    c.unpersist()
  }

  test("beam policy: persist/read/route; rebuild AND key rotation fence it stale from metadata alone") {
    val c = corpus().persist()
    val egPath = graft.store.Scratch.dir("graft_encg_pol")
    var eg = new EncryptedGraph(spark, egPath, Key)
    eg.build(c, k = 4, bucketFns, refineRounds = 1)
    val panel = probePanel(6)
    val kq = 5
    // absent before any persist
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyAbsent)
    intercept[RuntimeException](eg.beamPolicy(panel, kq))
    val beams = eg.persistBeamPolicy(panel, kq)
    assert(beams.keySet == panel.map(_._1).toSet)
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyFresh)
    // a REOPEN serves the committed widths with zero calibration jobs
    val reopened = new EncryptedGraph(spark, egPath, Key)
    assert(reopened.beamPolicy(panel, kq) == beams)
    // the policy ROUTES: per-probe widths recall each probe's exact top-k
    val served = reopened.queryBatch(panel, kq, beamWidth = 1, hops = 6,
      beamOf = beams)
    val full = reopened.queryBatch(panel, kq, beamWidth = 32, hops = 6)
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids(served) == ids(full),
      "persisted per-probe widths must recall the full-width answer set")
    // a DIFFERENT panel or knob set reads ABSENT, never another panel's widths
    assert(eg.beamPolicyStatus(panel.take(2), kq) == IvfIndex.PolicyAbsent)
    assert(eg.beamPolicyStatus(panel, kq + 1) == IvfIndex.PolicyAbsent)
    // rebuild → STALE (the adjacency changed; widths carry no evidence)
    eg.build(c, k = 4, bucketFns, refineRounds = 0)
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyStale)
    intercept[RuntimeException](eg.beamPolicy(panel, kq))
    eg.persistBeamPolicy(panel, kq)
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyFresh)
    // KEY ROTATION → STALE from metadata alone (every ciphertext row
    // rewrote; the fence must flip without decrypting anything)
    val before = eg.queryBatch(panel, kq, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    eg = eg.rotateKey(Key2)
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyStale)
    // ... and the rotated tree still serves the same corpus under the new key
    val after = eg.queryBatch(panel, kq, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before, "rotation must change keys, never answers")
    eg.persistBeamPolicy(panel, kq)
    assert(eg.beamPolicyStatus(panel, kq) == IvfIndex.PolicyFresh)
    c.unpersist()
  }
}
