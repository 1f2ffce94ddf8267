package graft.tools

import graft.functions.{VectorFunctions => VF}
import graft.operators.KnnGraph
import graft.queries.AnnQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the graph-search query's stages. */
object ProfGS {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val e = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0).select(col("vec_id").as("id"), col("embedding").as("emb"))
    val qe = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).toArray
    def bucketFn(off: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      emb => (0 until 6).map { p =>
        when(VF.dot(emb, typedlit(AnnQueries.plane(off + p))) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    def t[A](tag: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"TIMER $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val g = t("build+count") { val g = KnnGraph.build(corpus, Seq(bucketFn(0), bucketFn(200)), 4); g.count(); g }
    t("beam1") { KnnGraph.beamSearch(g, corpus, qe, 5, 4, 3, Seq(1L,2L)).collect() }
    t("beam2") { KnnGraph.beamSearch(g, corpus, qe, 5, 4, 3, Seq(1L,2L)).collect() }
    t("full-query") { graft.queries.Registry.queries("q_ann_graph_search")(s, "/root/testdata/sf0.1").collect() }
    s.stop()
  }
}
