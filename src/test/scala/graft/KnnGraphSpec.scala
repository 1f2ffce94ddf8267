package graft

import graft.functions.{VectorFunctions => VF}
import graft.operators.KnnGraph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnGraphSpec extends AnyFunSuite with SparkTest {

  private val K = 4

  private lazy val vectors = spark.read.parquet(s"$sf001/embeddings.parquet")
    .filter(col("vec_id") < 2000) // bounded fixture for exact-truth comparison
    .select(col("vec_id").as("id"), col("embedding").as("emb"))
    .persist()

  /** 6-plane sign-LSH bucket from plane family `off` (same formula as the
    * ANN queries; different offsets give independent hash tables). */
  private def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 6).map { p =>
      when(VF.dot(e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def avgDist(g: org.apache.spark.sql.DataFrame): Double =
    g.agg(avg("dist")).head().getDouble(0)

  test("refine monotonically improves the graph and preserves shape") {
    val g0 = KnnGraph.build(vectors, Seq(bucketOf(0) _, bucketOf(200) _, bucketOf(400) _), K).persist()
    val n = vectors.count()
    // every node with bucket-mates has at most K edges, no self-loops
    assert(g0.filter(col("src") === col("dst")).count() == 0)
    assert(g0.groupBy("src").count().agg(max("count")).head().getLong(0) <= K)
    val rounds = Iterator.iterate(g0)(g => KnnGraph.refine(g, vectors, K).persist())
      .take(5).toSeq
    val dists = rounds.map(avgDist)
    info("avg edge dist per round: " + dists.map(d => f"$d%.4f").mkString(" -> "))
    dists.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"refinement round worsened the graph: $a -> $b")
    }
    val gN = rounds.last
    assert(gN.filter(col("src") === col("dst")).count() == 0)
    assert(gN.groupBy("src").count().agg(max("count")).head().getLong(0) <= K)
    // refinement converges toward the TRUE kNN graph: recall@K improves
    def recall(g: org.apache.spark.sql.DataFrame): Double = {
      val truth = exactGraph
      val hit = g.join(truth, Seq("src", "dst"), "left_semi").count()
      hit.toDouble / truth.count()
    }
    val (r0, rN) = (recall(g0), recall(gN))
    info(f"recall vs exact kNN graph: build=$r0%.3f after-4-rounds=$rN%.3f")
    assert(rN > r0, "refinement must recover true neighbors the LSH build missed")
    // far above the random-graph baseline K/(N-1) ~= 0.002
    assert(rN > 10 * K.toDouble / (n - 1), s"refined recall $rN not above chance")
  }

  test("beam search: bounded touch, exact distances, near-optimal quality") {
    val qe = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val corpus = vectors.filter(col("id") =!= 0)
    val n = corpus.count()
    val k = 5
    val graph = KnnGraph.build(corpus, Seq(bucketOf(0) _, bucketOf(200) _), K)
      .persist()
    val refined = KnnGraph.refine(graph, corpus, K).persist()
    val got = KnnGraph.beamSearch(refined, corpus, qe,
      k = k, beamWidth = 4, hops = 6, entries = Seq(1L, 2L)).collect()
    assert(got.length == k)
    // distances are EXACT (re-scored), monotone, deterministically ordered
    val brute = corpus
      .withColumn("dist", VF.l2Sq(col("emb"), typedlit(qe)))
      .orderBy(asc("dist"), asc("id")).limit(k)
      .select("id", "dist")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      val d = corpus.filter(col("id") === r.getLong(0))
        .withColumn("dist", VF.l2Sq(col("emb"), typedlit(qe))).head().getDouble(2)
      assert(r.getDouble(1) == d, "beam results carry exact distances")
    }
    assert(got.map(_.getDouble(1)).toSeq == got.map(_.getDouble(1)).sorted.toSeq)
    // quality: the synthetic embeddings are near-uniform (distances
    // concentrate), so strict top-k recall is a coin flip for ANY sub-scan
    // method — the meaningful gates are the approximation ratio vs the true
    // k-th neighbor and beating the corpus-median distance by a wide margin
    // (proof the walk NAVIGATES toward the probe rather than sampling)
    val hits = got.count(r => brute.contains(r.getLong(0)))
    val bruteKth = brute.values.max
    val median = corpus
      .withColumn("dist", VF.l2Sq(col("emb"), typedlit(qe)))
      .stat.approxQuantile("dist", Array(0.5), 0.001).head
    info(f"beam recall@$k = $hits/$k; best=${got.head.getDouble(1)}%.4f " +
      f"brute-kth=$bruteKth%.4f median=$median%.4f over n=$n")
    assert(got.head.getDouble(1) <= 1.3 * bruteKth,
      s"beam best ${got.head.getDouble(1)} too far off brute kth $bruteKth")
    assert(got.map(_.getDouble(1)).max < median,
      "every beam result must beat the corpus-median distance")
    // the walk touches a bounded neighborhood, not the corpus: the visited
    // bound is entries + hops*beam*K proposals
    assert(2 + 6 * 4 * K < n / 3, "budget stays well under the corpus size")
    // determinism: identical re-run
    val again = KnnGraph.beamSearch(refined, corpus, qe,
      k = k, beamWidth = 4, hops = 6, entries = Seq(1L, 2L)).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  private lazy val exactGraph = {
    val l = vectors.select(col("id").as("src"), col("emb").as("semb"))
    val r = vectors.select(col("id").as("dst"), col("emb").as("demb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(asc("dist"), asc("dst"))
    l.crossJoin(r).filter(col("src") =!= col("dst"))
      .withColumn("dist", VF.l2Sq(col("semb"), col("demb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select("src", "dst").persist()
  }
}
