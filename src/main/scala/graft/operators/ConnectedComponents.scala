package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list by iterative min-label
 * propagation: every vertex starts labeled with its own id; each round a
 * vertex takes the minimum label among itself and its neighbors; at
 * fixpoint the label is the smallest vertex id in the component.
 *
 * This is the cluster-resolution step a dedup pipeline needs between
 * "near-dup PAIRS found" (MinHash/SimHash joins) and "keep ONE
 * representative per duplicate GROUP" — pairs alone under-merge when
 * A~B and B~C but A!~C.
 *
 * Scale shape: each round is one shuffle (edge-label join on dst) plus one
 * hash aggregate (min per vertex); state per round is one (id, label) row
 * per vertex — never materializes the transitive closure. Rounds needed =
 * component diameter, and near-dup clusters have tiny diameters (they are
 * dense similarity cliques); `maxIter` bounds pathological chains. Lineage
 * is truncated every round with `localCheckpoint` (an unbounded iterative
 * plan otherwise grows until the optimizer chokes — same hygiene as the
 * attack loop, SURVEY.md §4.3.3). For billion-edge graphs with huge
 * diameters the alternating large-star/small-star algorithm (Kiveris et
 * al., "Connected Components in MapReduce") halves rounds to
 * O(log^2 n); the per-round dataflow below is the building block either
 * way.
 */
object ConnectedComponents {

  /** Label every vertex of the undirected graph `edges` (two LONG columns
    * `src`, `dst`) with the minimum vertex id reachable from it.
    * Returns (id LONG, component LONG), one row per distinct endpoint. */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
          maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(src).as("s"), col(dst).as("d"))
    val sym = e.union(e.select(col("d"), col("s"))).distinct().persist()

    var labels = sym.select(col("s").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // candidate labels: own + each neighbor's current label
      val viaNeighbors = sym
        .join(labels, sym("d") === labels("id"))
        .select(sym("s").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy("id")
        .agg(min("component").as("component"))
        .localCheckpoint()
      done = next.withColumnRenamed("component", "c_new")
        .join(labels.withColumnRenamed("component", "c_old"), "id")
        .filter(col("c_new") =!= col("c_old"))
        .isEmpty
      labels = next
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** Size-adaptive entry point. Verified near-dup edge lists are sparse
    * relative to the corpus (LSH banding + jaccard verification has already
    * pruned ~all pairs), so below `collectThreshold` edges the graph fits on
    * the driver comfortably and exact union-find there replaces ~2 Spark
    * jobs per round with ONE collect — same labels (min id per component),
    * none of the per-round scheduling overhead. Above the threshold it falls
    * back to the distributed loop. The threshold compares EDGE count, which
    * the caller's pair-join already materializes cheaply. */
  def runAuto(edges: DataFrame, src: String = "src", dst: String = "dst",
              maxIter: Int = 20, collectThreshold: Long = 2000000): DataFrame = {
    val e = edges.select(col(src).as("s"), col(dst).as("d")).persist()
    val n = e.count()
    val out =
      if (n > collectThreshold) run(e, "s", "d", maxIter)
      else {
        val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        pairs.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val labels = parent.keys.toSeq.map(v => (v, find(v)))
        val spark = edges.sparkSession
        import spark.implicits._
        labels.toDF("id", "component")
      }
    e.unpersist()
    out
  }
}
