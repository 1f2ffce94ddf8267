package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared filesystem protocol for the store modules — ONE copy of the
 * recursive delete and the copy-on-write stage-and-swap publish used by
 * [[VectorStore]] rewrites, [[EncryptedStore]] key rotation, and
 * [[GraphIndex]] inserts, so a fix to the protocol (crash windows, rename
 * failure handling) lands everywhere at once.
 */
private[store] object StoreIO {

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }

  /** One surviving row per `id`, DETERMINISTIC under intra-batch repeats:
    * ties order by the JSON of the payload columns, so two runs of the same
    * pipeline keep the same row whatever the shuffle layout (repeats with
    * identical payloads pick identically by construction). Chroma raises on
    * duplicate ids in a batch; deduping keeps appends idempotent instead. */
  def dedupById(df: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(asc_nulls_first("__tie"))
    df.withColumn("__tie", to_json(struct(payloadCols.map(col): _*)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__tie")
  }

  /** Materialize `df` to `<dest>__stage`, then atomically swap it in for
    * the live `dest` (old data parked at `<dest>__old` during the swap and
    * removed after). Readers of `dest` never see a half-written dir; a
    * crash between the two renames leaves the data recoverable in
    * `<dest>__old`. */
  def stageAndSwap(df: DataFrame, dest: String): Unit = {
    val stage = s"${dest}__stage"
    val old = s"${dest}__old"
    df.write.mode("overwrite").parquet(stage)
    rmTree(new java.io.File(old))
    require(new java.io.File(dest).renameTo(new java.io.File(old)) &&
      new java.io.File(stage).renameTo(new java.io.File(dest)),
      s"atomic swap failed for $dest")
    rmTree(new java.io.File(old))
  }
}
