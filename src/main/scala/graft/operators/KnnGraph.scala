package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate kNN-graph construction and NN-Descent-style refinement.
 *
 * Build: candidates come from LSH sign-bucket blocking (the q_knn_graph
 * shape) — the self-join shuffles on the bucket key, each bucket joins only
 * itself. Refine: NN-Descent's core observation is that a neighbor of a
 * neighbor is likely a neighbor, so each round proposes `dst -> dst2` paths
 * as new candidate edges, scores them exactly, and keeps the best k of
 * (old ∪ proposed) per node. Every round is two joins + one window — the
 * candidate volume is O(N·k²), independent of bucket quality, and the
 * graph monotonically improves (the kept set per node only ever gets
 * closer: old edges survive unless beaten).
 *
 * At 100 TB: graph and vectors co-partition on the node id; each round
 * shuffles edge triples, never vectors-cross-vectors.
 */
object KnnGraph {

  /** Top-k neighbor edges (src, dst, dist) per vector from LSH-bucket
    * candidates over SEVERAL hash tables. One bucketing alone partitions
    * the graph into disconnected blocks (every edge stays inside its
    * bucket), which starves [[refine]] — a neighbor-of-a-neighbor can
    * never leave the block. Multiple independent bucketings give each node
    * neighbors from different blocks, exactly what NN-Descent rounds then
    * merge toward the true graph. `vectors`: (id LONG, emb ARRAY<FLOAT>).
    *
    * SCALE CALIBRATION: candidate volume is Σ bucket², so the bucket COUNT
    * must grow with the corpus — pick ~log2(N / targetBucketSize) sign
    * planes per table (bucket size 8-32). Measured at 40k vectors: a 6-bit
    * bucketing calibrated for 2k vectors generates 50M pairs (15 s,
    * quadratic); 12-bit brings it to ~0.8M pairs (2.7 s) — same recall
    * role, since multi-table union + [[refine]] supply the long-range
    * edges either way (SURVEY §8.3). */
  def build(vectors: DataFrame,
            bucketFns: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column],
            k: Int): DataFrame =
    buildDirected(vectors, vectors, bucketFns, k)

  /** [[build]] generalized to distinct sides: top-k edges from each
    * `srcSide` row to `dstSide` rows sharing a bucket — the self-join form
    * above AND [[graft.store.GraphIndex]]'s incremental insert (new rows ×
    * existing ∪ new) are both this one candidate-generation block. */
  def buildDirected(srcSide: DataFrame, dstSide: DataFrame,
                    bucketFns: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column],
                    k: Int): DataFrame = {
    require(bucketFns.nonEmpty, "need at least one bucketing")
    val w = Window.partitionBy("src").orderBy(asc("dist"), asc("dst"))
    bucketFns.map { bucketOf =>
      val left = srcSide.select(col("id").as("src"), col("emb").as("semb"),
        bucketOf(col("emb")).as("bucket"))
      val right = dstSide.select(col("id").as("dst"), col("emb").as("demb"),
        bucketOf(col("emb")).as("db"))
      left.join(right, col("bucket") === col("db") && col("src") =!= col("dst"))
        .withColumn("dist", VF.l2Sq(col("semb"), col("demb")))
        .select("src", "dst", "dist")
    }.reduce(_ unionByName _)
      .groupBy("src", "dst").agg(min("dist").as("dist")) // same pair from 2 tables
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist")
  }

  /** Query-time graph traversal — the HNSW-class serving capability over a
    * built kNN graph (the reference's Chroma backend is hnswlib,
    * /root/reference/src/chromadb_store.py:4): best-first BEAM SEARCH. Each
    * hop expands the unvisited out-neighbors of the current `beamWidth`
    * closest visited nodes, scores them EXACTLY against the query, and the
    * final answer is the exact top-k of everything visited — so the search
    * touches O(entries + hops·beamWidth·k) vectors instead of the corpus.
    * Fully deterministic: fixed hop count, ties break by ascending id.
    *
    * Scale shape: the beam (≤ beamWidth ids) broadcasts into a join against
    * the graph, co-partitioned with the vectors on the node id; the visited
    * set stays bounded by the expansion budget, so every hop is a
    * small-broadcast join — never a corpus scan. The driver loop carries no
    * data, only DataFrame handles (for deep walks, localCheckpoint the
    * visited frame every ~10 hops to cap lineage).
    *
    * `graph`: (src, dst, dist) from [[build]]/[[refine]];
    * `vectors`: (id, emb). */
  def beamSearch(graph: DataFrame, vectors: DataFrame, qe: Array[Float],
                 k: Int, beamWidth: Int, hops: Int, entries: Seq[Long]): DataFrame = {
    require(entries.nonEmpty, "beam search needs at least one entry point")
    // the walk references the graph and the score map EVERY hop — without
    // caching, hop h recomputes the whole graph-construction lineage h
    // times (measured 5 s -> ~1 s on the sf0.1 bench); visited is
    // localCheckpoint'd per hop (it is tiny — the expansion budget), which
    // also cuts the growing union lineage
    val g = graph.select("src", "dst").persist()
    val scored = vectors.select(col("id"),
      VF.l2Sq(col("emb"), org.apache.spark.sql.functions.typedlit(qe)).as("dist"))
      .persist()
    // visited is at most the expansion budget (tens of rows) — single
    // partition, so each hop's checkpoint job runs one task, not one per
    // shuffle partition
    var visited = scored.filter(col("id").isin(entries: _*))
      .coalesce(1).localCheckpoint()
    for (_ <- 1 to hops) {
      val beam = visited.orderBy(asc("dist"), asc("id")).limit(beamWidth)
        .select(col("id").as("src"))
      val fresh = g.join(broadcast(beam), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .join(scored, "id") // exact re-score of newly-reached nodes
        .select("id", "dist")
      visited = visited.unionByName(fresh).coalesce(1).localCheckpoint()
    }
    val out = visited.orderBy(asc("dist"), asc("id")).limit(k).localCheckpoint()
    g.unpersist()
    scored.unpersist()
    out
  }

  /** One NN-Descent round: propose neighbors-of-neighbors, score exactly,
    * keep best k of old ∪ proposed per src. `graph`: (src, dst, dist). */
  def refine(graph: DataFrame, vectors: DataFrame, k: Int): DataFrame = {
    val emb = vectors.select(col("id"), col("emb"))
    // paths src -> dst -> dst2 (two hops), dst2 becomes a candidate of src
    val hops = graph.select(col("src"), col("dst"))
      .join(graph.select(col("src").as("mid"), col("dst").as("dst2")),
        col("dst") === col("mid"))
      .filter(col("src") =!= col("dst2"))
      .select(col("src"), col("dst2").as("dst"))
      .distinct()
    val proposed = hops
      .join(emb.select(col("id").as("src"), col("emb").as("semb")), "src")
      .join(emb.select(col("id").as("dst"), col("emb").as("demb")), "dst")
      .select(col("src"), col("dst"), VF.l2Sq(col("semb"), col("demb")).as("dist"))
    val w = Window.partitionBy("src").orderBy(asc("dist"), asc("dst"))
    graph.select("src", "dst", "dist")
      .unionByName(proposed)
      .groupBy("src", "dst").agg(min("dist").as("dist")) // dedup re-proposed edges
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("src", "dst", "dist")
  }
}
