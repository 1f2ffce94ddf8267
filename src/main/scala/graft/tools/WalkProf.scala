package graft.tools

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only harness for the frame-walk probe (r14): builds the
  * q_encrypt_graph_df fixture once, then times the frame-walk probe over
  * repeated runs with AQE on and off — isolating the walk's driver-side
  * constant (AQE stage scheduling + per-hop planning) from its job time.
  * Not driver contract. */
object WalkProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"),
        concat(lit("doc for vector "), col("vec_id")).as("doc"),
        col("embedding").as("emb"))
    val eg = new graft.store.EncryptedGraph(
      spark, graft.store.Scratch.dir("graft_walkprof"), "0123456789abcdef")
    var t0 = System.nanoTime()
    def bucketFn(off: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      emb => (0 until 6).map { p =>
        when(VF.dot(emb, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    eg.build(corpus, k = 4, Seq(bucketFn(0), bucketFn(200)), refineRounds = 0)
    println(f"BUILD=${(System.nanoTime() - t0) / 1e9}%.2f")
    val panelDf = e.filter(col("vec_id") === 0)
      .select(lit(0L).as("probe_id"), col("embedding").as("qe"))
    for (aqe <- Seq("true", "false"); _ <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      t0 = System.nanoTime()
      eg.queryBatchDF(panelDf, topK = 5, beamWidth = 4, hops = 3,
          entries = Seq(1L, 2L), includeDoc = true)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE aqe=$aqe%-5s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.queries.Registry.releasePending()
    spark.stop()
  }
}
