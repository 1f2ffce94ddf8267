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

  /** Fixed-point scale for [[trainQuantized]]: 2^20 (a power of two, so
    * `float × Scale` is EXACT in double — quantization loses nothing but
    * sub-2^-20 precision of the mean). */
  val QuantScale: Double = 1048576.0

  /** Deterministic farthest-first (k-center) seeding: seed 1 is the
    * lowest-id row; each next seed maximizes its distance to the chosen set
    * (ties to the lowest id). The deterministic stand-in for k-means++ —
    * no RNG, bit-reproducible, and it handles the 100 TB ingest norm of
    * data arriving SORTED BY DOMAIN, where first-k-rows seeding puts every
    * seed in one cluster and Lloyd cannot escape the symmetric init
    * (measured: cells never separate, probes scan MORE than untrained).
    * k-1 narrow passes over the input (cache it); at corpus scale this
    * runs on a bounded sample. */
  /** Above this row count the seed selection runs as distributed jobs;
    * below it the (id, emb) pairs collect and the identical argmax runs
    * driver-side — k tiny sequential Spark jobs are pure scheduling
    * overhead on a small input, and both paths are bit-identical (same
    * double math, same ascending-id ties). */
  val DriverSeedBound: Long = 131072L

  def farthestFirstSeeds(vectors: DataFrame, idCol: String, embCol: String,
                         k: Int, knownN: Option[Long] = None): Array[(Long, Array[Float])] = {
    // callers that already counted the (cached) input hand the count
    // through — the dispatch needs only the driver-vs-distributed verdict,
    // and a redundant count job is pure driver latency on a warm build
    val n = knownN.getOrElse(vectors.count())
    if (n <= DriverSeedBound) farthestFirstDriver(
      vectors.select(col(idCol).cast("long"), col(embCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)), k)
    else farthestFirstDistributed(vectors, idCol, embCol, k)
  }

  /** The distributed arm of [[farthestFirstSeeds]] — package-visible so
    * KMeansSpec can pin it bit-identical to the driver arm below the
    * bound (the dispatch must never change the chosen seeds). */
  private[graft] def farthestFirstDistributed(vectors: DataFrame, idCol: String,
                                              embCol: String,
                                              k: Int): Array[(Long, Array[Float])] = {
    val first = vectors.orderBy(idCol).limit(1)
      .select(col(idCol).cast("long"), col(embCol)).head()
    val seeds = scala.collection.mutable.ArrayBuffer(
      (first.getLong(0), first.getSeq[Float](1).toArray))
    // INCREMENTAL min-distance maintenance, the driver path's discipline
    // distributed: the per-row nearest-seed distance is CARRIED in a
    // materialized narrow frame and folded with only the NEWEST seed each
    // round — one pass per seed, O(k·N·dim) total. (The original
    // formulation recomputed the distance to EVERY chosen seed per round —
    // O(k²·N·dim) with a k-term codegen expression tree; at 97 cells over
    // 200k rows it ran for 40+ minutes where this finishes in under a
    // minute.) Storage discipline: each round persists the updated frame,
    // materializes it, and UNPERSISTS the previous one (≤2 copies live);
    // every 16th round goes through localCheckpoint instead, which CUTS
    // THE LINEAGE — an unbounded persisted chain overflowed the
    // task-deserialization stack at ~depth 90, and localCheckpoint blocks
    // are freed by the ContextCleaner, bounding the pinned checkpoints to
    // ~k/16. least() is an exact min, so the fold order cannot change any
    // value and the DuckDB oracle's min-over-all-seeds replay still
    // hash-matches.
    var cur = vectors
      .select(col(idCol).cast("long").as("__id"), col(embCol).as("__e"))
      .withColumn("__md", VF.l2Sq(col("__e"), typedlit(seeds.head._2)))
      .persist()
    cur.count(): Unit
    var round = 0
    while (seeds.length < k) {
      // exclude chosen seeds, like the driver path and the oracle: with
      // duplicate vectors every candidate can sit at distance 0, and the
      // unfiltered argmax would re-pick an existing seed
      val next = cur
        .filter(!col("__id").isin(seeds.map(_._1).toSeq: _*))
        .orderBy(desc("__md"), asc("__id")).limit(1).head()
      seeds += ((next.getLong(0), next.getSeq[Float](1).toArray))
      if (seeds.length < k) {
        round += 1
        val upd0 = cur.withColumn("__md",
          least(col("__md"), VF.l2Sq(col("__e"), typedlit(seeds.last._2))))
        val upd =
          if (round % 16 == 0) upd0.localCheckpoint(true)
          else { val u = upd0.persist(); u.count(): Unit; u }
        cur.unpersist() // no-op after a checkpoint round (not CacheManager-held)
        cur = upd
      }
    }
    cur.unpersist()
    seeds.sortBy(_._1).toArray
  }

  /** Driver-side farthest-first over collected rows — incremental min-dist
    * maintenance, O(N·k·dim); argmax scans in ascending-id order with
    * strict >, matching the distributed orderBy(desc(md), asc(id)). */
  private def farthestFirstDriver(rows: Array[(Long, Array[Float])],
                                  k: Int): Array[(Long, Array[Float])] = {
    val byId = rows.sortBy(_._1)
    require(byId.length >= k, s"need at least $k rows to seed $k centroids")
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val minD = Array.fill(byId.length)(Double.MaxValue)
    val chosen = Array.fill(byId.length)(false)
    var cur = 0 // lowest id first
    val seeds = scala.collection.mutable.ArrayBuffer(byId(0))
    chosen(0) = true
    while (seeds.length < k) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var i = 0
      while (i < byId.length) {
        if (!chosen(i)) {
          val d = math.min(minD(i), l2(byId(i)._2, byId(cur)._2))
          minD(i) = d
          if (d > bestD) { bestD = d; best = i }
        }
        i += 1
      }
      chosen(best) = true
      cur = best
      seeds += byId(best)
    }
    seeds.sortBy(_._1).toArray
  }

  /** Lloyd k-means whose centroid update is CROSS-ENGINE DETERMINISTIC:
    * per-dimension means accumulate as integer sums of `round(x * 2^20)`
    * (exact, commutative — unlike double sums, whose value depends on the
    * nondeterministic partition accumulation order), then divide back. Any
    * engine that repeats the same integer math — e.g. the DuckDB oracle for
    * q_ivf_index — reproduces the centroids BIT-FOR-BIT, so queries over the
    * trained index stay hash-verifiable. Seeds are the k lowest-`idCol` rows;
    * cluster ids are the seed row ids; empty cells keep their previous
    * centroid; assignment ties go to the lowest cluster id (the
    * [[graft.functions.NearestCentroid]] contract).
    *
    * Scale shape is identical to [[train]]: each round is one narrow fused
    * argmin pass plus one hash aggregate carrying k·dim longs. */
  def trainQuantized(vectors: DataFrame, idCol: String, embCol: String,
                     k: Int, iters: Int,
                     seeds: Option[Array[(Long, Array[Float])]] = None): Array[(Long, Array[Float])] = {
    // provided seeds carry the dimensionality — the head() probe is only
    // for the seedless path
    val dim = seeds.filter(_.nonEmpty).map(_.head._2.length)
      .getOrElse(vectors.select(size(col(embCol))).head().getInt(0))
    var cb: Array[(Long, Array[Float])] = seeds.getOrElse {
      vectors
        .orderBy(idCol).limit(k)
        .select(col(idCol).cast("long"), col(embCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    }.sortBy(_._1)
    require(cb.length == k, s"need at least $k rows to seed $k centroids")
    for (_ <- 0 until iters) {
      val aggs = count(lit(1)).as("n") +: (0 until dim).map { d =>
        sum(round(element_at(col("__emb"), d + 1).cast("double") * QuantScale)
          .cast("long")).as(s"q$d")
      }
      val byCell = vectors
        .select(assign(col(embCol), cb).as("__cell"), col(embCol).as("__emb"))
        .groupBy("__cell")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> r).toMap
      cb = cb.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(r) =>
            val n = r.getLong(1)
            (cid, Array.tabulate(dim)(d =>
              (r.getLong(2 + d).toDouble / (QuantScale * n)).toFloat))
          case None => (cid, old)
        }
      }
    }
    cb
  }

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
