package graft.tools

import graft.functions.{VectorFunctions => VF}
import graft.operators.KnnGraph
import graft.queries.AnnQueries
import graft.store.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: scale-stress the round-2 operators (trained IVF build, graph
  * build + beam search) on the /tmp/scaleN fixtures (SURVEY §8.3). */
object ProfScale2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val qe = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).toArray
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF2 $tag ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)"); r
    }
    val base = java.nio.file.Files.createTempDirectory("scale_ivf").toString
    val idx = new IvfIndex(s, base, 16)
    t("ivf_build_trained") { idx.build(corpus) }
    val sizes = s.read.parquet(s"$base/data").groupBy("cell").count()
      .collect().map(_.getLong(1))
    println(s"PROF2 ivf_cells max=${sizes.max} mean=${sizes.sum / sizes.length}")
    t("ivf_probe") { idx.query(qe, 5, 4).collect() }
    def bucketFn(off: Int, bits: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      emb => (0 until bits).map { p =>
        when(VF.dot(emb, typedlit(AnnQueries.plane(off + p))) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    // fixed 6-bit buckets (the sf0.1 calibration) go quadratic at scale;
    // the scale-correct call grows the bucket count with N:
    // bits ~ log2(N / 10) per table
    val bits = math.max(6, (math.log(n.toDouble / 10.0) / math.log(2.0)).ceil.toInt)
    if (sys.env.contains("PROF2_FIXED6")) {
      t("graph_build_6bit_fixed") {
        KnnGraph.build(corpus, Seq(bucketFn(0, 6), bucketFn(200, 6)), 4).count()
      }
    }
    val g = t(s"graph_build_${bits}bit_scaled") {
      val g = KnnGraph.build(corpus, Seq(bucketFn(0, bits), bucketFn(200, bits)), 4); g.count(); g
    }
    t("beam_search_scaled") { KnnGraph.beamSearch(g, corpus, qe, 5, 4, 3, Seq(1L, 2L)).collect() }
    s.stop()
  }
}
