package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Full-vector Lloyd k-means — [[ProductQuantizer.train]] with a single
 * subspace IS k-means over the whole vector, so clustering reuses the
 * quantizer's scale shape verbatim: each round is one narrow fused-argmin
 * assignment pass plus one hash aggregate whose shuffle carries k·dim
 * doubles total, independent of corpus size. Deterministic seeding (first
 * k rows of the passed frame's order), empty clusters keep their previous
 * centroid — Lloyd's monotone-inertia guarantee holds.
 *
 * The training-data uses: corpus clustering for curriculum/domain
 * balancing, IVF centroid training, and embedding-space diagnostics
 * (q_embedding_outliers consumes exactly this assignment).
 */
object KMeans {

  /** Train k centroids over `embCol` (ARRAY<FLOAT>); returns id-sorted
    * (clusterId, centroid). Pass an id-ordered frame for reproducibility. */
  def train(vectors: DataFrame, embCol: String, k: Int, iters: Int): Array[(Long, Array[Float])] =
    ProductQuantizer.train(vectors, embCol, m = 1, k = k, iters = iters)(0)

  /** Cluster assignment column (narrow fused argmin, codegen). */
  def assign(emb: Column, centroids: Array[(Long, Array[Float])]): Column =
    VF.nearestCentroid(emb, centroids)

  /** Total within-cluster squared distance (the Lloyd objective). */
  def inertia(vectors: DataFrame, embCol: String,
              centroids: Array[(Long, Array[Float])]): Double = {
    val centMap = typedlit(centroids.map { case (cid, c) => cid -> c }.toMap)
    vectors
      .withColumn("__cell", assign(col(embCol), centroids))
      .withColumn("__d", VF.l2Sq(col(embCol), element_at(centMap, col("__cell"))))
      .agg(sum("__d")).head().getDouble(0)
  }
}
