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
    try {
      var g = KnnGraph.build(v, bucketFns, k)
      (0 until refineRounds).foreach(_ => g = KnnGraph.refine(g, v, k))
      v.write.mode("overwrite").parquet(vecPath)
      g.write.mode("overwrite").parquet(graphPath)
    } finally v.unpersist(): Unit
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
    val oldV = vectors.persist()
    // replay/overlap safety: ids already indexed are skipped (the same
    // idempotent-append discipline as VectorStore.add / IvfIndex), and an
    // intra-batch id repeat keeps one row (a replayed batch carries
    // identical rows, so the surviving row is identical either way)
    val newV = batch.select(col("id"), col("emb"))
      .dropDuplicates("id")
      .join(oldV.select("id"), Seq("id"), "left_anti")
      .persist()
    val g = graph.persist()
    val newEdges = KnnGraph.buildDirected(
      newV, oldV.unionByName(newV), bucketFns, k).persist()
    try {
      if (newV.isEmpty) return
      // reverse proposals let existing nodes adopt new neighbors. ONE
      // window resolves every touched source (new nodes AND proposal
      // targets) over old edges ∪ proposals ∪ new out-edges — resolving
      // new and affected nodes separately would give a node reached from
      // both sides up to 2k edges
      val w = Window.partitionBy("src").orderBy(asc("dist"), asc("dst"))
      val proposals = newEdges.select(
        col("dst").as("src"), col("src").as("dst"), col("dist"))
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
      // vectors FIRST: a crash between the swaps then leaves only benign
      // extra vectors with no edges — graph-first would commit edges whose
      // dst vectors do not exist, silently shrinking touched nodes'
      // neighbor lists at query time
      StoreIO.stageAndSwap(oldV.unionByName(newV), vecPath)
      StoreIO.stageAndSwap(merged, graphPath)
    } finally Seq(newV, oldV, newEdges, g).foreach(_.unpersist())
  }
}
