package graft.operators

/**
 * Diversity re-ranking over a bounded shortlist — the post-retrieval stage
 * every production search pipeline runs after ANN (the reference stops at
 * raw kNN, /root/reference/src/cod.py:125-129; MMR is the standard next
 * step, Carbonell & Goldstein 1998).
 *
 * Maximal Marginal Relevance: greedily select
 *   argmax_d  λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
 *
 * MMR is inherently sequential (each pick depends on all previous picks),
 * so it does NOT distribute — and does not need to: the input is a top-K
 * shortlist (tens to hundreds of rows) produced by the distributed ANN
 * stage. The scale split is: cluster computes the shortlist, driver (or a
 * single task via `mapPartitions` for many queries at once) runs the
 * O(K²·k) greedy loop. All ties break by ascending id, making the
 * selection fully deterministic.
 */
object Reranker {

  /** One shortlist candidate: id, query relevance, unit-normalized-or-not
    * embedding (cosine is normalized internally). */
  final case class Candidate(id: Long, rel: Double, emb: Array[Float])

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    // dot/(sqrt(na)*sqrt(nb)) — the exact operation order of the engine's
    // CosineSimilarity kernel and the DuckDB oracle fragment, so the greedy
    // scores are bitwise cross-engine comparable
    if (na == 0.0 || nb == 0.0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR selection of `k` items from `shortlist`.
    * Returns (id, mmrScore) in selection order; the first pick's score is
    * its pure relevance (no selected set yet). */
  def mmr(shortlist: Seq[Candidate], k: Int, lambda: Double): Seq[(Long, Double)] = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val pool = scala.collection.mutable.ArrayBuffer(shortlist.sortBy(_.id): _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val pickedEmb = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (picked.length < k && pool.nonEmpty) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < pool.length) {
        val c = pool(i)
        val maxSim = if (pickedEmb.isEmpty) 0.0
          else pickedEmb.map(e => cosine(c.emb, e)).max
        val score = lambda * c.rel - (1.0 - lambda) * maxSim
        // strict > plus ascending-id pool order = deterministic tie-break
        if (score > bestScore) { bestScore = score; bestIdx = i }
        i += 1
      }
      val c = pool.remove(bestIdx)
      picked += ((c.id, bestScore))
      pickedEmb += c.emb
    }
    picked.toSeq
  }
}
