package graft.store

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ONE copy of the batched DRIVER beam-walk schedule — shared by
 * [[GraphIndex.queryBatch]] (plaintext vectors) and
 * [[EncryptedGraph.queryBatch]] (decrypt-on-read vectors), so the encrypted
 * twin pins beam-for-beam equality with the plaintext walk BY CONSTRUCTION
 * (the [[CellRoute]]/[[ExactPrune]] discipline for the graph family: entry
 * admission, per-probe (dist, id) beam selection, frontier evolution and
 * the final exact top-k all live here once).
 *
 * `vEmb` is a LAZY (id LONG, emb ARRAY<FLOAT>) frame. Per hop the walk
 * In-filters it to the frontier's FRESH ids before the projection
 * evaluates — Catalyst pushes the id filter below the projection to the
 * scan, so on the encrypted twin AES-GCM decryption runs ONLY on the
 * O(hops · |batch| · beam · k) fresh rows a walk touches, never the
 * corpus (the [[EncryptedStore.queryIndexedBatchDF]] bounded-decrypt
 * argument, applied per hop).
 */
private[store] object GraphWalk {

  /** Batched beam search: one In-pruned graph read and one In-pruned,
    * pair-bounded scoring job per hop for the WHOLE probe batch. `beamOf`
    * overrides the uniform `beamWidth` per probe (a persisted beam
    * policy); `eligibleOf` maps the visited ids to the answer-set
    * predicate (metadata filters — constant-true on the encrypted twin,
    * whose metadata is ciphertext). Output (probe_id, id, dist, rn). */
  def batch(spark: SparkSession, g: DataFrame, vEmb: DataFrame,
            probes: Seq[(Long, Array[Float])], topK: Int, beamWidth: Int,
            hops: Int, starts: Seq[Long], beamOf: Map[Long, Int],
            eligibleOf: Seq[Long] => (Long => Boolean)): DataFrame = {
    require(probes.nonEmpty, "queryBatch needs at least one probe")
    require(probes.map(_._1).distinct.length == probes.length,
      "probe ids must be unique")
    val probeDf = broadcast(
      spark.createDataFrame(probes.map { case (pid, qe) => (pid, qe.toSeq) })
        .toDF("probe_id", "qe"))
    val visited = scala.collection.mutable.HashMap[Long, scala.collection.mutable.HashMap[Long, Double]]()
    probes.foreach { case (pid, _) => visited(pid) = scala.collection.mutable.HashMap() }
    def score(pairs: Seq[(Long, Long)]): Unit = if (pairs.nonEmpty) {
      val ids = pairs.map(_._2).distinct.sorted
      val pairDf = broadcast(spark.createDataFrame(pairs).toDF("probe_id", "id"))
      vEmb.filter(col("id").isin(ids: _*))
        .join(pairDf, "id")
        .join(probeDf, "probe_id")
        .select(col("probe_id"), col("id"),
          VF.l2Sq(col("emb"), col("qe").cast("array<float>")).as("dist"))
        .collect()
        .foreach(r => visited(r.getLong(0))(r.getLong(1)) = r.getDouble(2))
    }
    score(for { (pid, _) <- probes; e <- starts } yield (pid, e))
    var hop = 0
    var open = true
    while (hop < hops && open) {
      val beams = probes.map { case (pid, _) =>
        pid -> visited(pid).toSeq.sortBy { case (id, d) => (d, id) }
          .take(beamOf.getOrElse(pid, beamWidth)).map(_._1)
      }
      val allSrcs = beams.flatMap(_._2).distinct.sorted
      val adj: Map[Long, Seq[Long]] =
        if (allSrcs.isEmpty) Map.empty
        else g.filter(col("src").isin(allSrcs: _*)).select("src", "dst").collect()
          .groupBy(_.getLong(0)).map { case (s, rows) => s -> rows.map(_.getLong(1)).toSeq }
      val fresh = for {
        (pid, beam) <- beams
        id <- beam.flatMap(adj.getOrElse(_, Seq.empty)).distinct
        if !visited(pid).contains(id)
      } yield (pid, id)
      open = fresh.nonEmpty
      score(fresh)
      hop += 1
    }
    val ok = eligibleOf(visited.valuesIterator.flatMap(_.keysIterator).toSeq.distinct)
    val out = for {
      (pid, _) <- probes
      ((id, d), i) <- visited(pid).toSeq
        .filter { case (id, _) => ok(id) }
        .sortBy { case (id, d) => (d, id) }.take(topK).zipWithIndex
    } yield (pid, id, d, i + 1)
    import spark.implicits._
    out.toDF("probe_id", "id", "dist", "rn")
  }

  /** Panel identity for a beam-policy sidecar — (k, hops, ladder) plus a
    * per-probe hash of (pid, embedding float bits), order-independent.
    * Shared by the plaintext and encrypted `_beams` fences so a policy can
    * never be mistaken across twins' formats. */
  def beamPanelFp(panel: Seq[(Long, Array[Float])], k: Int,
                  ladder: Seq[Int], hops: Int): Long = {
    val knobs = ladder.distinct.sorted
      .foldLeft(k.toLong * 1000003L + hops)((a, b) => a * 31L + b)
    panel.map { case (pid, pe) =>
      pid * 1000003L + java.util.Arrays.hashCode(pe).toLong
    }.sorted.foldLeft(knobs)((acc, h) => acc * 6364136223846793005L + h)
  }

  /** Medoids of `numEntries` deterministically-trained k-means cells —
    * the shared entry-point trainer ([[GraphIndex.build]]'s and
    * [[EncryptedGraph.build]]'s): farthest-first seeds + quantized Lloyd
    * (bit-reproducible), then one window picks each cell's closest
    * vector. Runs on PLAINTEXT-in-flight embeddings (the encrypted twin
    * trains before encryption lands, the [[EncryptedStore.storeIndexed]]
    * k-means discipline). */
  def medoidEntries(spark: SparkSession, ve: DataFrame, numEntries: Int): DataFrame = {
    val kE = math.min(numEntries.toLong, ve.count()).toInt
    val seeds = graft.operators.KMeans.farthestFirstSeeds(ve, "id", "emb", kE)
    val cents = graft.operators.KMeans.trainQuantized(
      ve, "id", "emb", kE, IvfIndex.TrainIters, Some(seeds))
    val centDf = spark.createDataFrame(cents.toSeq.map { case (cid, c) => (cid, c.toSeq) })
      .toDF("cell", "cemb")
    val w = Window.partitionBy("cell").orderBy(asc("d"), asc("id"))
    ve.withColumn("cell", VF.nearestCentroid(col("emb"), cents))
      .join(broadcast(centDf), "cell")
      .withColumn("d", VF.l2Sq(col("emb"), col("cemb").cast("array<float>")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cell"), col("id"))
  }
}
