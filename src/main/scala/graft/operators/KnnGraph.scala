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
    * final answer is the exact top-k of everything visited. Fully
    * deterministic: fixed hop budget, ties break by ascending id.
    *
    * Scale shape: the walk's whole state is the visited set — bounded by
    * entries + hops·beamWidth·k ids, NEVER the corpus — so the driver
    * coordinates it and each hop issues two point reads with the id set
    * pushed INTO the scan (`PushedFilters: In[src]` on the graph,
    * `In[id]` on the vectors): neighbor lists of the beam, then exact
    * distances of only the newly-reached ids. On an id-sorted parquet
    * index (see [[graft.store.GraphIndex]]) those In-filters prune to a
    * few row groups — per-query cost is O(hops·beam·k) rows touched,
    * invariant in corpus size. Distances come from the same [[VF.l2Sq]]
    * codegen kernel as every other query, so results are bit-identical to
    * a full-corpus scoring formulation.
    *
    * `graph`: (src, dst, dist) from [[build]]/[[refine]];
    * `vectors`: (id, emb) — callers with a non-trivial lineage (an
    * in-query build) should persist both, since each hop re-reads them. */
  def beamSearch(graph: DataFrame, vectors: DataFrame, qe: Array[Float],
                 k: Int, beamWidth: Int, hops: Int, entries: Seq[Long]): DataFrame = {
    val visited = beamVisited(graph, vectors, qe, beamWidth, hops, entries)
    val spark = vectors.sparkSession
    import spark.implicits._
    visited.toSeq.sortBy { case (id, d) => (d, id) }.take(k).toDF("id", "dist")
  }

  /** The beam walk itself: every visited node with its exact distance.
    * Exposed so index-level serving ([[graft.store.GraphIndex]]) can apply
    * metadata eligibility to the FULL candidate set before taking top-k. */
  def beamVisited(graph: DataFrame, vectors: DataFrame, qe: Array[Float],
                  beamWidth: Int, hops: Int, entries: Seq[Long]): Map[Long, Double] = {
    val qlit = org.apache.spark.sql.functions.typedlit(qe)
    beamVisitedBy(graph,
      vectors.select(col("id"), VF.l2Sq(col("emb"), qlit).as("dist")),
      beamWidth, hops, entries)
  }

  /** [[beamVisited]] with the scoring ABSTRACTED into the `scored` frame,
    * which must project exactly (id LONG, dist DOUBLE) in that order —
    * the walk schedule (entry fetch, (dist, id) beam
    * selection, sorted frontier expansion, early fixed-point stop) is
    * byte-identical whatever the distance is, which is what lets the
    * quantized serving path ([[graft.store.GraphIndex]] walking SQ8 code
    * distances) share ONE walk definition with the exact path instead of
    * a drifting copy. */
  def beamVisitedBy(graph: DataFrame, scored: DataFrame,
                    beamWidth: Int, hops: Int, entries: Seq[Long]): Map[Long, Double] = {
    require(entries.nonEmpty, "beam search needs at least one entry point")
    // point-read + score ONLY the requested ids: the In-filter reaches the
    // source scan, and the scoring column runs on just the fetched rows
    def fetch(ids: Seq[Long]): Seq[(Long, Double)] =
      if (ids.isEmpty) Seq.empty
      else scored.filter(col("id").isin(ids: _*))
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    val visited = scala.collection.mutable.HashMap[Long, Double]()
    visited ++= fetch(entries.distinct.sorted)
    var hop = 0
    var frontierOpen = true
    while (hop < hops && frontierOpen) {
      val beam = visited.toSeq.sortBy { case (id, d) => (d, id) }
        .take(beamWidth).map(_._1)
      val fresh =
        if (beam.isEmpty) Seq.empty[Long]
        else graph.filter(col("src").isin(beam: _*))
          .select("dst").distinct()
          .collect().toSeq.map(_.getLong(0))
          .filterNot(visited.contains).sorted
      // an empty frontier is a fixed point: the beam cannot change, so no
      // later hop can reach anything new — stop early, same answer
      frontierOpen = fresh.nonEmpty
      visited ++= fetch(fresh)
      hop += 1
    }
    visited.toMap
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
