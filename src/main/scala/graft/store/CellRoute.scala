package graft.store

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ONE copy of the frame-probe routing geometry the DF serving routes rest
 * on — the plaintext ([[IvfIndex.queryBatchDF]]/[[IvfIndex.queryBatchQuantizedDF]])
 * and encrypted ([[EncryptedStore.queryIndexedBatchDF]]) twins pin
 * bit-equality contracts that depend on the SAME per-probe cell order,
 * depth clamping, and broadcast-vs-salt switchover; a per-copy tweak would
 * silently break parity, so the copies don't exist (the [[ExactPrune]]
 * discipline for the batched-frame surfaces).
 */
private[store] object CellRoute {

  /** Cell ROUTING for a probe FRAME — (probe_id, qe, cell), each probe
    * paired with its top-`depth` nearest cells in the engine-wide
    * (squared centroid distance, cell) total order. The per-probe cut is
    * [[graft.operators.GroupedTopK]], NOT a probe-keyed window: a window
    * would shuffle the full P × numCells routing frame to the reducers,
    * while the aggregate ships ≤ depth × P entries — at a corpus-fraction
    * probe frame the routing exchange is itself answer-volume.
    *
    * With `useDepth`, a `depth` INTEGER column on `probes` is the
    * per-probe policy (`exactDepths` / `depthPolicy` handed through a
    * frame instead of a driver map): null entries fall back to `nprobe`,
    * values clamp to [0, numCells] — a non-positive depth routes that
    * probe to zero cells (it answers empty, exactly the Seq route's
    * `take(depth)` behavior). A non-integral depth column REFUSES loudly
    * (a silently cast-nulled depth would fall back to uniform nprobe and
    * change recall without a trace). Depth-blind callers pass
    * `useDepth = false`, so a stray `depth` column on a reused frame can
    * never silently change their uniform-nprobe contract — serving at a
    * frame's depths is an explicit opt-in on every public route.
    *
    * `probe_id` must be UNIQUE within the frame — duplicates would blend
    * two probes' candidates into one merged top-k through the
    * first(qe)/first(pdepth) group resolution, so the routing REFUSES
    * loudly (one bounded aggregation over the probe frame, which also
    * computes the constant max depth the routing aggregate needs). */
  def routeCells(spark: SparkSession, probes: DataFrame,
                 cents: Array[(Long, Array[Float])], numCells: Int,
                 nprobe: Int, useDepth: Boolean): DataFrame = {
    val centDf = spark.createDataFrame(
      cents.toSeq.map { case (cid, c) => (cid, c.toSeq) }).toDF("cell", "cemb")
    val uniform = math.min(math.max(nprobe, 0), numCells)
    if (useDepth) {
      require(probes.columns.contains("depth"),
        "useDepth = true needs an integer `depth` column on the probe frame")
      val dt = probes.schema("depth").dataType
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"the `depth` policy column must be integral, got $dt — a cast-nulled " +
          "depth would silently fall back to uniform nprobe and change recall")
    }
    val depthCol =
      if (useDepth)
        least(greatest(coalesce(col("depth").cast("long"), lit(nprobe.toLong)),
          lit(0L)), lit(numCells.toLong)).cast("int")
      else lit(uniform)
    val sized = probes.select(col("probe_id"),
      col("qe").cast("array<float>").as("qe"), depthCol.as("pdepth"))
    // ONE bounded aggregation over the probe frame: the aggregate's k must
    // be a constant (the largest requested depth — the uniform clamp when
    // no policy rides the frame), and the same pass fails loudly on
    // duplicate probe_id rows. Null max (empty frame) → serve empty
    // through depth 1.
    val stat = sized.agg(max(col("pdepth")).as("mx"),
      count(lit(1)).as("n"), count_distinct(col("probe_id")).as("nd")).head()
    require(stat.getLong(1) == stat.getLong(2),
      s"probe frame has duplicate probe_id rows (${stat.getLong(1)} rows, " +
        s"${stat.getLong(2)} distinct ids) — the routing group-by would blend " +
        "distinct probes' candidates into one merged top-k")
    val maxDepth =
      if (!useDepth) math.max(1, uniform)
      else if (stat.isNullAt(0)) 1
      else math.max(1, stat.getInt(0))
    sized
      .crossJoin(broadcast(centDf))
      .withColumn("cdist", VF.l2Sq(col("qe"), col("cemb").cast("array<float>")))
      .groupBy("probe_id")
      .agg(graft.operators.GroupedTopK.topK(maxDepth)(col("cdist"), col("cell"))
          .as("cells"),
        first(col("qe")).as("qe"), first(col("pdepth")).as("pdepth"))
      .select(col("probe_id"), col("qe"), col("pdepth"),
        posexplode(col("cells")).as(Seq("pos", "sc")))
      .filter(col("pos") < col("pdepth"))
      .select(col("probe_id"), col("qe"), col("sc.id").as("cell"))
  }

  /** Equi-join a cell-pruned corpus scan (carries `id` and a long `cell`)
    * with a per-probe routing frame keyed by `cell` — WITHOUT collapsing
    * parallelism to the ≤ numCells distinct join keys. A plain shuffle
    * join on `cell` hash-partitions BOTH sides by a key with at most
    * numCells values: every (corpus row × probe) pair for a cell is
    * generated — and its top-k partials aggregated — by ONE task, so a
    * 32-core scan degrades to ~numCells-way parallelism (measured 8×
    * slower than the Seq route at a 4096-probe panel over 19 cells).
    *
    *  - probe side ≤ the ProbeJoin broadcast limit: broadcast it — the
    *    corpus never moves and the join runs at scan parallelism (the
    *    Seq route's shape, with the frame in place of a driver panel).
    *    `probeRows` counts routed ENTRIES (≤ depth × P — the rows the
    *    broadcast actually ships), see the unit note at
    *    [[graft.operators.ProbeJoin.broadcastLimit]].
    *  - above the limit: SALT — the corpus side widens its key to
    *    (cell, xxhash64(id) % S) and the probe side replicates across
    *    the S-value salt space, spreading each cell's pair generation
    *    and map-side top-k partials over S tasks. Probe-side shuffle
    *    volume is S × the routing frame — bounded, and the corpus
    *    (the side that is 100 TB) still moves only once. The join is
    *    HINTED shuffle_hash: a sort-merge join re-iterates the buffered
    *    probe group once per corpus row (measured ~9× slower than the
    *    broadcast route at a 16384-probe panel), while the hash relation
    *    gives the same per-row bucket lookup the broadcast route enjoys.
    *
    * Row set identical on both routes (every (row, probe) cell pair
    * appears exactly once), so serving answers never depend on the
    * route taken. */
  def routedJoin(corpus: DataFrame, probeSide: DataFrame,
                 probeRows: Long, numCells: Int): DataFrame = {
    val spark = corpus.sparkSession
    val limit = graft.operators.ProbeJoin.broadcastLimit(spark)
    if (probeRows <= limit) corpus.join(broadcast(probeSide), Seq("cell"))
    else {
      // size the salt space to what parallelism needs, not a fixed fanout:
      // (numCells × S) keys should comfortably cover the partition count —
      // replicating ×32 when the cell count alone already exceeds the
      // partitions would pay probe-shuffle volume for nothing
      val parts = math.max(2, spark.sparkContext.defaultParallelism)
      val s = math.max(2, math.ceil(2.0 * parts / math.max(1, numCells)).toInt)
      corpus
        .withColumn("__salt", pmod(xxhash64(col("id")), lit(s.toLong)).cast("int"))
        .join(probeSide.withColumn("__salt",
          explode(sequence(lit(0), lit(s - 1)))).hint("shuffle_hash"),
          Seq("cell", "__salt"))
        .drop("__salt")
    }
  }
}
