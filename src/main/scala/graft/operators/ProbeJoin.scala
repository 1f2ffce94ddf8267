package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Exact probe×corpus pairing that never broadcasts a frame that grows with
 * the corpus.
 *
 * The brute-force retrieval/labeling queries (q_knn_classifier,
 * q_crossmodal — probe sets carved out of the corpus itself, reference
 * retrieval loop at src/cod.py:125-139) pair every probe with every corpus
 * row and reduce map-side with [[GroupedTopK]]. `broadcast(probes)` is the
 * right plan while the probe set is small — the corpus never moves — but a
 * probe side that is a FRACTION of the corpus eventually exceeds what the
 * driver and every executor can hold: a broadcast that grows with N is a
 * deferred out-of-memory, not a plan.
 *
 * So: up to `graft.probe.broadcastLimit` probe rows (default 65536) this
 * is exactly `corpus.crossJoin(broadcast(probes))`. Above it, the pairing
 * becomes Spark's shuffle-replicate nested loop (CartesianProduct): probes
 * are repartitioned into `ceil(p / limit)` limit-sized chunks and each
 * (corpus partition × probe chunk) pair is a task streaming both sides
 * from block storage — per-task memory is bounded by the chunk size, no
 * driver collection, no per-executor full-probe copy. The exact P×N
 * compute is inherent to brute-force semantics (the output contract is
 * "exact top-k"); what changes at scale is only WHERE the pairs
 * materialize. Row set is identical on both routes, so oracles are
 * unaffected; PlanSpec pins the over-limit plan broadcast-free.
 *
 * (A deployment that can tolerate approximate results swaps this scan for
 * the attached IVF/graph index route — q_ann_ivf_batch / Collection.query
 * — which prunes the corpus side instead; that is a different contract.)
 */
object ProbeJoin {

  val LimitKey = "graft.probe.broadcastLimit"

  /** ONE copy of the limit resolution — every broadcast-vs-distributed
    * probe-pairing decision ([[cross]], `CellRoute.routedJoin`) reads the
    * same knob and default. UNIT NOTE: the knob counts the rows the
    * broadcast would actually ship, which differs per caller — [[cross]]
    * compares PROBE rows (its broadcast side is the probe frame), while
    * the cell-routed DF serving joins compare routed ENTRIES (≤ depth ×
    * probes — their broadcast side is the routing frame). A limit tuned
    * for [[cross]] therefore flips the DF routes to the salted equi-join
    * ~depth× earlier in probe count: conservative (both routes are exact
    * and the salted join stays scan-parallel), never unsafe. */
  def broadcastLimit(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(LimitKey).map(_.toLong).getOrElse(65536L)

  /** @param probeCount the probe-side row count when the caller already
    *                    knows it; -1 triggers a count (one narrow scan —
    *                    the broadcast route needed the same pass anyway). */
  def cross(corpus: DataFrame, probes: DataFrame, probeCount: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    val limit = broadcastLimit(spark)
    val p = if (probeCount >= 0) probeCount else probes.count()
    if (p <= limit) corpus.crossJoin(broadcast(probes))
    else {
      val chunks = math.max(1, math.ceil(p.toDouble / limit).toInt)
      // shuffle_replicate_nl forces CartesianProduct even when the probe
      // side's size estimate is under the auto-broadcast threshold
      corpus.crossJoin(probes.repartition(chunks).hint("shuffle_replicate_nl"))
    }
  }
}
