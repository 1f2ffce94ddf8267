package graft.store

import graft.functions.{VectorFunctions => VF}
import graft.operators.KnnGraph
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Persistent kNN-graph index — the graph twin of [[IvfIndex]] and the
 * durable form of the reference's HNSW index (hnswlib inside ChromaDB,
 * /root/reference/src/chromadb_store.py:4): vectors and their top-k
 * neighbor edges live as parquet; queries run [[KnnGraph.beamSearch]] over
 * them; NEW vectors are wired in INCREMENTALLY the way HNSW inserts are —
 * find each new node's neighbors, then refresh the reverse direction so
 * existing nodes may adopt a new node into their own top-k.
 *
 * Scale shape: build and insert shuffle on LSH bucket keys and on the edge
 * src key only (never vectors-cross-vectors); an insert batch touches
 * O(|batch| · bucket) candidate pairs plus one window over (existing edges
 * of affected nodes ∪ proposals). At 100 TB graph and vectors co-partition
 * on the node id; bucket width must scale with N (see [[KnnGraph.build]]'s
 * calibration note).
 */
final class GraphIndex(spark: SparkSession, path: String, k: Int,
                       bucketFns: Seq[Column => Column]) {
  require(bucketFns.nonEmpty, "need at least one LSH bucketing")

  private def vecPath = s"$path/vectors"
  private def graphPath = s"$path/graph"

  def vectors: DataFrame = spark.read.parquet(vecPath)
  def graph: DataFrame = spark.read.parquet(graphPath)

  /** Build from (id LONG, emb ARRAY<FLOAT>): multi-table LSH candidate
    * join + `refineRounds` NN-Descent passes, persisted. */
  def build(input: DataFrame, refineRounds: Int = 1): Unit = {
    val v = input.select(col("id"), col("emb")).persist()
    var g = KnnGraph.build(v, bucketFns, k)
    (0 until refineRounds).foreach(_ => g = KnnGraph.refine(g, v, k))
    v.write.mode("overwrite").parquet(vecPath)
    g.write.mode("overwrite").parquet(graphPath)
    v.unpersist(): Unit
  }

  /** Beam-search the persisted graph (exact distances, deterministic). */
  def query(qe: Array[Float], topK: Int, beamWidth: Int, hops: Int,
            entries: Seq[Long]): DataFrame =
    KnnGraph.beamSearch(graph, vectors, qe, topK, beamWidth, hops, entries)

  /** HNSW-style incremental insert, batched and fully distributed:
    *  1. candidate edges for the batch come from the LSH bucket join of
    *     new vectors against (existing ∪ new) — new nodes get their own
    *     top-k out-edges exactly like a build restricted to the new side;
    *  2. the REVERSE direction: every (new -> dst) pair is proposed as
    *     (dst -> new), and each affected existing node keeps the best k of
    *     (its current edges ∪ proposals) — without this, new nodes would
    *     be unreachable from the old graph and beam search could never
    *     find them.
    * Both steps are bucket-/key-bounded joins plus one window; the
    * untouched remainder of the graph is carried over unchanged. */
  def insert(batch: DataFrame): Unit = {
    val newV = batch.select(col("id"), col("emb")).persist()
    val oldV = vectors.persist()
    val all = oldV.unionByName(newV)
    // 1. out-edges for new nodes: bucket join, new side only as src
    val w = Window.partitionBy("src").orderBy(asc("dist"), asc("dst"))
    val newEdges = bucketFns.map { bucketOf =>
      val left = newV.select(col("id").as("src"), col("emb").as("semb"),
        bucketOf(col("emb")).as("bucket"))
      val right = all.select(col("id").as("dst"), col("emb").as("demb"),
        bucketOf(col("emb")).as("db"))
      left.join(right, col("bucket") === col("db") && col("src") =!= col("dst"))
        .withColumn("dist", VF.l2Sq(col("semb"), col("demb")))
        .select("src", "dst", "dist")
    }.reduce(_ unionByName _)
      .groupBy("src", "dst").agg(min("dist").as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist")
      .persist()
    // 2. reverse proposals let existing nodes adopt new neighbors. ONE
    // window resolves every touched source (new nodes AND proposal
    // targets) over old edges ∪ proposals ∪ new out-edges — resolving new
    // and affected nodes separately would give a node reached from both
    // sides up to 2k edges
    val proposals = newEdges.select(
      col("dst").as("src"), col("src").as("dst"), col("dist"))
    val g = graph.persist()
    val touched = proposals.select("src")
      .unionByName(newEdges.select("src")).distinct()
    val refreshed = g.join(touched, Seq("src"), "left_semi")
      .unionByName(proposals)
      .unionByName(newEdges)
      .groupBy("src", "dst").agg(min("dist").as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist")
    val untouched = g.join(touched, Seq("src"), "left_anti")
    val merged = untouched.unionByName(refreshed)
    // stage-and-swap both stores (same discipline as Collection.rewrite)
    def swap(df: DataFrame, dest: String): Unit = {
      val stage = s"${dest}__stage"; val old = s"${dest}__old"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      df.write.mode("overwrite").parquet(stage)
      rm(new java.io.File(old))
      require(new java.io.File(dest).renameTo(new java.io.File(old)) &&
        new java.io.File(stage).renameTo(new java.io.File(dest)),
        s"atomic swap failed for $dest")
      rm(new java.io.File(old))
    }
    swap(merged, graphPath)
    swap(all, vecPath)
    Seq(newV, oldV, newEdges, g).foreach(_.unpersist())
  }
}
