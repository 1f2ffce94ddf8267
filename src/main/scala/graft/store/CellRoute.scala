package graft.store

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
    * loudly. The guard rides INSIDE the routing aggregate (each unique
    * probe row crosses exactly |centroids| rows, so an oversized group is
    * a duplicate — checked by assert_true, zero extra jobs); only the
    * in-frame depth policy pays a pre-routing scan (the bounded max the
    * aggregate's constant k needs). */
  /** The `depth` policy column's shape contract — ONE copy shared by the
    * routing and the small-panel dispatch, so the refusal fires with the
    * same message on either lane. */
  def requireDepthColumn(probes: DataFrame): Unit = {
    require(probes.columns.contains("depth"),
      "useDepth = true needs an integer `depth` column on the probe frame")
    val dt = probes.schema("depth").dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"the `depth` policy column must be integral, got $dt — a cast-nulled " +
        "depth would silently fall back to uniform nprobe and change recall")
  }

  def routeCells(spark: SparkSession, probes: DataFrame,
                 cents: Array[(Long, Array[Float])], numCells: Int,
                 nprobe: Int, useDepth: Boolean): DataFrame = {
    val centDf = spark.createDataFrame(
      cents.toSeq.map { case (cid, c) => (cid, c.toSeq) }).toDF("cell", "cemb")
    val uniform = math.min(math.max(nprobe, 0), numCells)
    if (useDepth) requireDepthColumn(probes)
    val depthCol =
      if (useDepth)
        least(greatest(coalesce(col("depth").cast("long"), lit(nprobe.toLong)),
          lit(0L)), lit(numCells.toLong)).cast("int")
      else lit(uniform)
    val sized = probes.select(col("probe_id"),
      col("qe").cast("array<float>").as("qe"), depthCol.as("pdepth"))
    // the aggregate's k must be a constant — the largest requested depth.
    // Depth-blind routes know it statically (the uniform clamp), so they
    // pay ZERO pre-routing jobs; only an in-frame policy needs the one
    // bounded max scan. Null max (empty frame) → serve empty through
    // depth 1.
    val maxDepth =
      if (!useDepth) math.max(1, uniform)
      else {
        val mx = sized.agg(max(col("pdepth"))).head()
        if (mx.isNullAt(0)) 1 else math.max(1, mx.getInt(0))
      }
    sized
      .crossJoin(broadcast(centDf))
      .withColumn("cdist", VF.l2Sq(col("qe"), col("cemb").cast("array<float>")))
      .groupBy("probe_id")
      .agg(graft.operators.GroupedTopK.topK(maxDepth)(col("cdist"), col("cell"))
          .as("cells"),
        first(col("qe")).as("qe"), first(col("pdepth")).as("pdepth"),
        count(lit(1)).as("__nr"))
      // duplicate-id guard folded into the routing aggregate itself (zero
      // extra jobs — the r12 version paid a separate driver-blocking stat
      // pass per serving call): a UNIQUE probe row crosses exactly
      // |centroids| rows, so any larger group is a duplicated probe_id
      // whose first(qe)/first(pdepth) resolution would blend two probes'
      // candidates into one merged top-k — refuse loudly instead.
      // Cost of the executor-side refusal: on a cluster the failing task
      // retries spark.task.maxFailures times before the job dies, and the
      // surfaced type is a wrapped SparkException — callers must match on
      // the MESSAGE, never the exception type (IvfIndexSpec's discipline)
      .filter(isnull(assert_true(col("__nr") === lit(cents.length.toLong),
        concat(lit("duplicate probe_id rows in the probe frame (probe_id="),
          col("probe_id").cast("string"),
          lit(") — the routing group-by would blend distinct probes' " +
            "candidates into one merged top-k")))))
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
                 probeRows: Long, numCells: Int): DataFrame =
    keyedProbeJoin(corpus, probeSide, probeRows, numCells, "cell", col("id"))

  /** [[routedJoin]] generalized over the join key — the same
    * broadcast-or-salt switchover for ANY low-cardinality equi-join of a
    * corpus-scale side against a probe-derived side (the TextIndex
    * batched postings×pairs join keys on `term` and salts on `doc_id`;
    * the IVF routes key on `cell` and salt on `id`). `numKeys` sizes the
    * salt space: it is the parallelism ceiling a plain shuffle join would
    * collapse to. */
  private[store] def keyedProbeJoin(bigSide: DataFrame, probeSide: DataFrame,
                                    probeRows: Long, numKeys: Int,
                                    key: String, saltOn: Column): DataFrame = {
    val spark = bigSide.sparkSession
    val limit = graft.operators.ProbeJoin.broadcastLimit(spark)
    if (probeRows <= limit) bigSide.join(broadcast(probeSide), Seq(key))
    else {
      // size the salt space to what parallelism needs, not a fixed fanout:
      // (numKeys × S) keys should comfortably cover the partition count —
      // replicating ×32 when the key count alone already exceeds the
      // partitions would pay probe-shuffle volume for nothing
      val parts = math.max(2, spark.sparkContext.defaultParallelism)
      val s = math.max(2, math.ceil(2.0 * parts / math.max(1, numKeys)).toInt)
      bigSide
        .withColumn("__salt", pmod(xxhash64(saltOn), lit(s.toLong)).cast("int"))
        .join(probeSide.withColumn("__salt",
          explode(sequence(lit(0), lit(s - 1)))).hint("shuffle_hash"),
          Seq(key, "__salt"))
        .drop("__salt")
    }
  }
}
