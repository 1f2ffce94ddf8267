package graft.store

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Persistent IVF index over a vector collection: vectors are assigned to
 * their nearest centroid cell and written `partitionBy("cell")`, so a probe
 * reads ONLY the `nprobe` partition directories it needs — at 100 TB the
 * query's scan volume is `nprobe / numCells` of the corpus, enforced by
 * partition pruning in the parquet source (visible as `PartitionFilters`
 * in the plan), not by a runtime filter.
 *
 * Centroids are deterministic (the lowest-id vectors) rather than trained —
 * the index layout, assignment argmin, pruning and re-rank are the real
 * machinery; swapping in k-means centroids changes only `build`'s centroid
 * selection. The reference's ANN index (HNSW inside ChromaDB,
 * /root/reference/src/chromadb_store.py:4) is the capability being rebuilt;
 * IVF-with-partition-pruning is its Spark-native shape.
 */
final class IvfIndex(spark: SparkSession, path: String, numCells: Int) {

  private def centroidPath = s"$path/_centroids"
  private def dataPath = s"$path/data"

  /** Fused argmin cell assignment (narrow, single codegen loop). */
  private def cellCol(cents: Array[(Long, Array[Float])], emb: Column): Column =
    VF.nearestCentroid(emb, cents)

  /** Build from (id LONG, emb ARRAY<FLOAT>): pick deterministic centroids,
    * assign every vector, write cell-partitioned parquet. ONE narrow pass
    * over the input plus the partitioned write. The data lands under
    * `batch=0` so that incremental [[appendBatch]] writes share a uniform
    * (batch, cell) directory layout. */
  def build(vectors: DataFrame): Unit = {
    val cents = vectors
      .orderBy("id").limit(numCells)
      .select(col("id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    spark.createDataFrame(cents.toSeq.map { case (cid, c) => (cid, c.toSeq) })
      .toDF("cid", "cemb")
      .write.mode("overwrite").parquet(centroidPath)
    new java.io.File(dataPath).mkdirs()
    vectors
      .withColumn("cell", cellCol(cents, col("emb")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dataPath/batch=0")
  }

  private def centroids(): Array[(Long, Array[Float])] =
    spark.read.parquet(centroidPath).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  /** Incremental maintenance: assign new vectors against the EXISTING
    * centroids and land them under this batch's OWN directory
    * (`batch=<id>/cell=...`). Replaying a micro-batch overwrites the same
    * directory, so the write is IDEMPOTENT — with Structured Streaming's
    * at-least-once foreachBatch replay this yields exactly-once index
    * contents (the standard idempotent-sink pattern; batchId comes from the
    * checkpoint). One narrow pass per batch, resident data untouched,
    * queries see the union across batch dirs with cell pruning intact.
    * Cell balance degrades only as far as the data drifts from the
    * centroids; a periodic [[build]] re-clusters (the compaction story). */
  def appendBatch(vectors: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0, "batchId must be non-negative (batch 0 is the initial build)")
    val cents = centroids()
    vectors
      .withColumn("cell", cellCol(cents, col("emb")))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dataPath/batch=${batchId + 1}")
  }

  /** Merge all accumulated batch directories back into a single `batch=0`
    * layout (assignments are already materialized in the `cell` partition
    * column, so compaction is a pure re-write — no vector math). Run this
    * when streaming has produced many small per-batch files; contents and
    * query results are unchanged. Stage-and-swap keeps readers safe. */
  def compact(): Unit = {
    val all = spark.read.parquet(dataPath).select(col("id"), col("emb"), col("cell"))
    val stage = s"$path/data__stage"
    val old = s"$path/data__old"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(stage)); rm(new java.io.File(old))
    all.write.mode("overwrite").partitionBy("cell").parquet(s"$stage/batch=0")
    require(new java.io.File(dataPath).renameTo(new java.io.File(old)) &&
      new java.io.File(stage).renameTo(new java.io.File(dataPath)),
      "atomic compaction swap failed")
    rm(new java.io.File(old))
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  /** Top-k by squared L2, scanning only the nprobe nearest cells. */
  def query(qe: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val cells = centroids().map { case (cid, c) => (l2(c, qe), cid) }
      .sorted.take(nprobe).map(_._2).toSeq
    spark.read.parquet(dataPath)
      .filter(col("cell").isin(cells: _*)) // partition pruning, not a row filter
      .withColumn("distance", VF.l2Sq(col("emb"), typedlit(qe)))
      .orderBy(asc("distance"), asc("id"))
      .limit(k)
      // partition-dir type inference reads `cell` back as INT; pin to LONG
      .select(col("id"), col("cell").cast("long").as("cell"), col("distance"))
  }

  /** Batched probe: top-k per probe for MANY query vectors in ONE pruned
    * scan. Each probe contributes its nprobe nearest cells; the index is
    * read once over the UNION of needed cells (still partition pruning),
    * probes broadcast with their cell lists, and a row is scored against a
    * probe only when the row's cell is in that probe's probe set — exactly
    * the per-probe candidate set of [[query]], so results match it probe
    * for probe. Per-probe top-k is a window over candidates. Batching
    * amortizes scan + scheduling across probes: Q probes cost one scan of
    * |union cells|, not Q scans — the embedding-join shape a training
    * pipeline runs (score a whole batch of leaked/query vectors at once). */
  def queryBatch(probes: Seq[(Long, Array[Float])], k: Int, nprobe: Int): DataFrame = {
    require(probes.nonEmpty, "queryBatch needs at least one probe")
    val cents = centroids()
    val probeCells: Seq[(Long, Array[Float], Seq[Long])] = probes.map { case (pid, qe) =>
      (pid, qe, cents.map { case (cid, c) => (l2(c, qe), cid) }.sorted.take(nprobe).map(_._2).toSeq)
    }
    val unionCells = probeCells.flatMap(_._3).distinct
    val probeDf = spark.createDataFrame(
      probeCells.map { case (pid, qe, cells) => (pid, qe.toSeq, cells) })
      .toDF("probe_id", "qe", "probe_cells")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(asc("distance"), asc("id"))
    spark.read.parquet(dataPath)
      .filter(col("cell").isin(unionCells: _*))
      .join(broadcast(probeDf),
        array_contains(col("probe_cells"), col("cell").cast("long")))
      .withColumn("distance", VF.l2Sq(col("emb"), col("qe").cast("array<float>")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("id"), col("cell").cast("long").as("cell"),
        col("distance"), col("rn"))
  }
}
