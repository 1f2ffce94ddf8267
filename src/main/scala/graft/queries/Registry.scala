package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered query per implemented operator (SURVEY.md §2). Each query is
 * a Spark program over the driver's parquet tables plus, where the semantics
 * are ANSI-SQL-expressible, an equivalent DuckDB oracle statement.
 *
 * Conventions that keep the DuckDB hash-compare stable:
 *  - every query has an explicit total ORDER BY (ties broken by a key);
 *  - floating-point outputs are rounded (per-row math: round 6; distributed
 *    sums: round 2-4 — accumulation order across partitions is nondeterministic
 *    so only coarse digits are comparable);
 *  - raw ARRAY<FLOAT> columns are never returned, only derived scalars;
 *  - aggregate results that DuckDB widens (sum(BIGINT) → HUGEINT) are cast
 *    back to BIGINT in the oracle.
 */
case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact row count of a parquet table from its FOOTER metadata — what a
    * `count()` job computes, without the job: parquet row-group headers
    * carry exact counts, so the builds that size an index from the corpus
    * count (cells ~ nDocs / target) read a few KB of driver-side metadata
    * instead of scheduling a scan (guide §5 — the driver should do almost
    * no data work, and metadata reads are not data work). Same listing
    * cost shape as the scan's own planning at any corpus size. */
  def tblRows(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def files(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(files)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
      else Seq.empty
    files(fs.getFileStatus(root)).map { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try rd.getRecordCount finally rd.close()
    }.sum
  }

  /** Materialize a BOUNDED query result (top-k / per-group-capped — never
    * corpus-sized) through its caches, then release them: queries persist()
    * intermediates that several downstream branches read, but the returned
    * frame is lazy, so un-persisting before the caller's action would just
    * recompute everything twice. `localCheckpoint` (eager) runs the plan
    * once WHILE the caches are hot and returns a lineage-free frame whose
    * blocks the ContextCleaner frees when the caller drops it — unlike the
    * persisted intermediates, which the CacheManager would otherwise pin
    * for the driver's lifetime, accumulating across a bench or notebook
    * session.
    *
    * Use [[releaseLater]] instead when the output is one-row-per-document:
    * checkpointing an O(corpus) frame would pin O(corpus) blocks in
    * executor storage and shift execution eagerly to plan-construction
    * time — the opposite of the 100 TB discipline. */
  def freeAfter(out: DataFrame, cached: DataFrame*): DataFrame = {
    val mat = out.localCheckpoint()
    cached.foreach(_.unpersist())
    mat
  }

  private val pendingRelease =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** [[freeAfter]]'s lazy twin for CORPUS-SIZED outputs (one row per doc):
    * the result stays a plain lazy plan (no checkpoint, no eager run, no
    * pinned blocks), its persisted intermediates stay hot for the caller's
    * action, and the harness releases them AFTERWARDS via
    * [[releasePending]] — Verify/Bench call it after each query's action,
    * so caches never accumulate across a session. A caller that never
    * calls [[releasePending]] degrades to the pre-r4 behavior (caches pinned
    * until the session ends), never to recompute. */
  def releaseLater(out: DataFrame, cached: DataFrame*): DataFrame = {
    cached.foreach(pendingRelease.add)
    out
  }

  /** Unpersist every frame queued by [[releaseLater]] — call after the
    * action that materializes the query result. */
  def releasePending(): Unit = {
    var df = pendingRelease.poll()
    while (df != null) { df.unpersist(); df = pendingRelease.poll() }
  }

  lazy val all: Seq[Q] =
    VectorQueries.all ++ RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      AnnQueries.all ++ StoreQueries.all ++ AttackQueries.all ++ OperatorQueries.all ++
      AnalyticsQueries.all ++ SearchQueries.all ++ MonitorQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
