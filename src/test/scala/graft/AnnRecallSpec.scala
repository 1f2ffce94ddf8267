package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Recall@k of every approximate path against exact brute-force kNN, on real
 * fixture vectors. Approximation quality is a correctness property of ANN:
 * a bug in bucketing/encoding usually shows up as recall collapse long
 * before it shows up in a hand-picked 5-row oracle.
 */
class AnnRecallSpec extends AnyFunSuite with SparkTest {

  private val K = 20

  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).persist()

  private lazy val probe: Array[Float] =
    vecs.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray

  private lazy val exactTopK: Set[Long] = vecs
    .filter(col("vec_id") =!= 0)
    .withColumn("d", VF.l2Sq(col("embedding"), typedlit(probe)))
    .orderBy(asc("d"), asc("vec_id")).limit(K)
    .select("vec_id").collect().map(_.getLong(0)).toSet

  private def recall(approx: Set[Long]): Double =
    (approx intersect exactTopK).size.toDouble / K

  test("IVF (16 cells, probe 4) recall@20 is high on fixture data") {
    val cents = vecs.filter(col("vec_id") < 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val cells = cents.map { case (cid, c) => (l2(c, probe), cid) }.sorted.take(4).map(_._2).toSeq
    val got = vecs
      .withColumn("cell", VF.nearestCentroid(col("embedding"), cents))
      .filter(col("cell").isin(cells: _*) && col("vec_id") =!= 0)
      .withColumn("d", VF.l2Sq(col("embedding"), typedlit(probe)))
      .orderBy(asc("d"), asc("vec_id")).limit(K)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val r = recall(got)
    info(f"IVF recall@$K = $r%.2f")
    assert(r >= 0.5, s"IVF recall collapsed: $r")
  }

  test("trained IVF centroids beat untrained seeding on clustered corpora") {
    // On the near-uniform fixture vectors, seed choice is statistical noise.
    // The pathology training exists for is CLUSTERED data arriving sorted by
    // domain (the 100 TB norm: ingest grouped by source): the first-k-rows
    // seeds then all land in ONE cluster, cells carve that cluster finely
    // and lump everything else — probes into other clusters scan huge
    // fractions or miss. Construct exactly that, deterministically: 16
    // clusters of 8.0-offset on distinct axes, cluster = vec_id / 31 so the
    // lowest 16 ids (the untrained seeds) are all cluster 0.
    val clustered = vecs
      .withColumn("cluster", (col("vec_id") / 31).cast("int") % 16)
      .withColumn("emb", transform(col("embedding"),
        (x, i) => when(i === col("cluster"), x + lit(8.0f)).otherwise(x)))
      .select(col("vec_id").as("id"), col("emb"))
      .persist()
    val untrainedCents = clustered.filter(col("id") < 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    // the IvfIndex.build pipeline: farthest-first seeds + quantized Lloyd
    // (first-k-rows-seeded Lloyd CANNOT escape this init — all seeds sit in
    // cluster 0, every cell mean converges to the same mixture; measured
    // before farthest-first seeding: trained scans MORE than untrained)
    val trainedCents = graft.operators.KMeans.trainQuantized(
      clustered, "id", "emb", 16, graft.store.IvfIndex.TrainIters,
      Some(graft.operators.KMeans.farthestFirstSeeds(clustered, "id", "emb", 16)))
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val total = clustered.count().toDouble
    val probeIds = Seq(45L, 120L, 201L, 333L, 470L) // clusters 1,3,6,10,15
    def stats(cents: Array[(Long, Array[Float])]): (Double, Double) = {
      val assigned = clustered
        .withColumn("cell", VF.nearestCentroid(col("emb"), cents)).persist()
      val rs = probeIds.map { pid =>
        val pe = clustered.filter(col("id") === pid).head().getSeq[Float](1).toArray
        val exact = clustered.filter(col("id") =!= pid)
          .withColumn("d", VF.l2Sq(col("emb"), typedlit(pe)))
          .orderBy(asc("d"), asc("id")).limit(K)
          .select("id").collect().map(_.getLong(0)).toSet
        val cells = cents.map { case (cid, c) => (l2(c, pe), cid) }.sorted.take(4).map(_._2).toSeq
        val scanned = assigned.filter(col("cell").isin(cells: _*) && col("id") =!= pid)
        val frac = scanned.count() / total
        val got = scanned
          .withColumn("d", VF.l2Sq(col("emb"), typedlit(pe)))
          .orderBy(asc("d"), asc("id")).limit(K)
          .select("id").collect().map(_.getLong(0)).toSet
        ((got intersect exact).size.toDouble / K, frac)
      }
      assigned.unpersist()
      (rs.map(_._1).sum / rs.size, rs.map(_._2).sum / rs.size)
    }
    val (rU, fU) = stats(untrainedCents)
    val (rT, fT) = stats(trainedCents)
    info(f"clustered IVF recall@$K (nprobe 4/16, 5 probes): " +
      f"untrained=$rU%.2f scanning ${fU * 100}%.0f%% vs trained=$rT%.2f scanning ${fT * 100}%.0f%%")
    clustered.unpersist()
    assert(rT >= rU, f"training must not lose recall on clustered data: $rU%.2f -> $rT%.2f")
    assert(rT / math.max(fT, 1e-9) > rU / math.max(fU, 1e-9),
      f"training must improve recall per scanned row: ${rU / fU}%.2f -> ${rT / fT}%.2f")
  }

  private def pqRecall(codebooks: graft.operators.ProductQuantizer.Codebooks): Double = {
    import graft.operators.ProductQuantizer
    val got = ProductQuantizer.encode(vecs.toDF(), "embedding", codebooks)
      .filter(col("vec_id") =!= 0)
      .withColumn("ad", ProductQuantizer.adcColumn(probe, codebooks))
      .orderBy(asc("ad"), asc("vec_id")).limit(K)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    recall(got)
  }

  test("PQ ADC: pure-code recall is nonzero; shortlist+exact refine recovers") {
    import graft.operators.ProductQuantizer
    val ordered = vecs.orderBy("vec_id")
    val trained = ProductQuantizer.train(ordered, "embedding", m = 8, k = 16, iters = 4)
    val rAdc = pqRecall(trained)
    val refined = ProductQuantizer.searchRefined(
      ProductQuantizer.encode(vecs.toDF(), "embedding", trained)
        .filter(col("vec_id") =!= 0),
      "embedding", "vec_id", probe, trained, k = K, shortlistFactor = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rRef = recall(refined)
    info(f"PQ recall@$K adc-only=$rAdc%.2f refined(10x)=$rRef%.2f")
    // 32-bit codes over 64 dims are lossy — ADC alone is a coarse filter...
    assert(rAdc >= 0.1, s"ADC recall collapsed: $rAdc")
    // ...but a 10x shortlist + exact re-rank must recover most of the truth
    assert(rRef >= 0.6, s"refined recall collapsed: $rRef")
    assert(rRef >= rAdc, s"refine made recall worse: $rAdc -> $rRef")
  }

  test("PQ training is reproducible on a sorted frame") {
    import graft.operators.ProductQuantizer
    val ordered = vecs.orderBy("vec_id")
    val a = ProductQuantizer.train(ordered, "embedding", m = 4, k = 8, iters = 2)
    val b = ProductQuantizer.train(ordered, "embedding", m = 4, k = 8, iters = 2)
    assert(a.map(_.toSeq.map { case (i, v) => (i, v.toSeq) }).toSeq ==
      b.map(_.toSeq.map { case (i, v) => (i, v.toSeq) }).toSeq)
  }

  test("exact kNN is its own fixpoint (sanity)") {
    assert(recall(exactTopK) == 1.0)
  }

  test("JL projection shortlist recovers most of the exact top-k after refine") {
    val out = graft.queries.Registry.queries("q_ann_jl")(spark, sf001).collect()
    assert(out.length == 5)
    val got = out.map(_.getLong(0)).toSet
    val r = (got intersect exactTopK).size.toDouble / 5
    info(f"JL(64->16) refined hit rate vs exact top-20 = $r%.2f")
    assert(r >= 0.6, s"JL recall collapsed: $r")
    val dists = out.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted)
  }

  test("IVF-PQ composed path: refined dists are true L2, candidates confined to probe cells") {
    val out = graft.queries.Registry.queries("q_ann_ivfpq")(spark, sf001).collect()
    assert(out.length == 5)
    // every returned dist must equal the exact L2 to the probe (the refine
    // stage scores raw vectors, not codes)
    val byId = vecs.filter(col("vec_id") =!= 0)
      .withColumn("d", VF.l2Sq(col("embedding"), typedlit(probe)))
      .select("vec_id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (id, dist) = (r.getLong(0), r.getDouble(2))
      assert(math.abs(dist - byId(id)) < 1e-4, s"vec $id: refined dist $dist != exact ${byId(id)}")
    }
    // dists ascend (it is a top-k by exact distance)
    val dists = out.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted)
    // the composed pruning still finds most of the exact top-5
    val exact5 = exactTopK // top-20 superset; top-5 of it:
    val got = out.map(_.getLong(0)).toSet
    val r5 = (got intersect exact5).size.toDouble / 5
    info(f"IVF-PQ hit rate vs exact top-20 = $r5%.2f")
    assert(r5 >= 0.4, s"IVF-PQ recall collapsed: $r5")
  }

  test("binary Hamming shortlist: recall@20 rises monotonically with shortlist depth") {
    // The tuning curve a deployment walks before trusting 1 bit/dim: a
    // deeper Hamming shortlist can only add candidates (supersets), so
    // recall after exact rerank must be non-decreasing in depth, and at
    // depth = corpus it equals exact search (recall 1.0) by construction.
    import graft.queries.AnnQueries
    val coded = vecs
      .withColumn("lo", AnnQueries.packHalf(col("embedding"), 0))
      .withColumn("hi", AnnQueries.packHalf(col("embedding"), 32))
    def qPack(off: Int): Long = {
      var b = 0L; var j = 0
      while (j < 32) { if (probe(off + j).toDouble > 0.0) b |= (1L << j); j += 1 }
      b
    }
    val withHam = coded.filter(col("vec_id") =!= 0)
      .withColumn("ham", bit_count(col("lo").bitwiseXOR(lit(qPack(0)))) +
        bit_count(col("hi").bitwiseXOR(lit(qPack(32)))))
      .persist()
    val n = withHam.count().toInt
    val depths = Seq(50, 100, 200, n)
    val recalls = depths.map { d =>
      val got = withHam.orderBy(asc("ham"), asc("vec_id")).limit(d)
        .withColumn("dd", VF.l2Sq(col("embedding"), typedlit(probe)))
        .orderBy(asc("dd"), asc("vec_id")).limit(K)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      recall(got)
    }
    withHam.unpersist()
    depths.zip(recalls).foreach { case (d, r) => info(f"depth $d%4d -> recall@$K = $r%.2f") }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in shortlist depth: $recalls")
    assert(recalls.last == 1.0, "full-depth shortlist must equal exact search")
    assert(recalls.head > 0.0, "a 50-deep shortlist must recover something")
  }
}
