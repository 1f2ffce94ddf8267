package graft.store

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Parquet-backed vector-store collections — Spark-native rebuild of the
 * reference's ChromaDB surface:
 *
 *  - named collection create-or-get  (/root/reference/src/cod.py:79-84,
 *    /root/reference/src/chromadb_store.py:4)
 *  - add(id, document, metadata, embedding) with duplicate-id rejection
 *    (/root/reference/src/cod.py:92-97, Chroma add semantics)
 *  - point-get by id list + include-projection
 *    (/root/reference/src/cod.py:102-113, src/chromadb_store.py:10-12)
 *  - full-scan extraction — the "leak" premise (src/chromadb_store.py:10-12)
 *  - top-k nearest-neighbor query with distances, squared-L2 (the store's
 *    Chroma-default metric) or cosine (the attack's metric)
 *    (/root/reference/src/cod.py:123-139, src/app.py:52-59)
 *
 * Scale design: a collection is a parquet directory (at 100 TB: partitioned
 * by a metadata key and bucketed by id for point-get pushdown); `add` is an
 * append with a broadcast anti-join on existing ids; `query` is one narrow
 * scan + TakeOrderedAndProject — no shuffle of the corpus. The in-memory
 * vs persisted duality of the reference (src/cod.py:56-62) maps to
 * `DataFrame.cache()` vs the parquet path.
 */
final class VectorStore(spark: SparkSession, basePath: String) {

  /** Collection record schema (reference data model, SURVEY.md §1.4). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("doc", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true),
    StructField("emb", ArrayType(FloatType, containsNull = false), nullable = true)))

  private def path(name: String): String = s"$basePath/$name"

  private def exists(name: String): Boolean =
    new java.io.File(s"${path(name)}/_SUCCESS").exists()

  /** Create-or-get by name (reference create/except-get, cod.py:79-84). */
  def createOrGet(name: String): Collection = {
    if (!exists(name))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(path(name))
    new Collection(name)
  }

  def dropCollection(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(path(name)))
  }

  final class Collection private[VectorStore] (val name: String) {

    def df: DataFrame = spark.read.schema(schema).parquet(path(name))

    def count(): Long = df.count()

    /** Append rows, rejecting ids already present (Chroma add semantics).
      * The existing-id side is broadcast — at scale the id set per append
      * batch is small relative to the store. */
    def add(rows: DataFrame): Unit = {
      val incoming = rows.select(col("id").cast(StringType).as("id"),
        col("doc"), col("meta"), col("emb"))
      val fresh = incoming.join(broadcast(df.select("id")), Seq("id"), "left_anti")
      fresh.write.mode("append").parquet(path(name))
    }

    /** get(): no ids -> full extraction (the leak); ids -> point lookup.
      * `include` projects columns (ids always included), mirroring
      * chromadb_store.py:10-12 / cod.py:108. */
    def get(ids: Seq[String] = Nil, include: Seq[String] = Seq("doc", "meta", "emb")): DataFrame = {
      val base = if (ids.isEmpty) df else df.filter(col("id").isin(ids: _*))
      base.select((col("id") +: include.map(col)): _*)
    }

    /** Top-k nearest neighbors with distances. metric: "l2" (store default,
      * ascending) or "cosine" (attack metric, descending similarity). */
    def query(queryEmb: Array[Float], k: Int, metric: String = "l2"): DataFrame = {
      val q = typedlit(queryEmb)
      val scored = metric match {
        case "l2" =>
          df.withColumn("distance", VF.l2Sq(col("emb"), q))
            .orderBy(asc("distance"), asc("id"))
        case "cosine" =>
          df.withColumn("distance", -VF.cosine(col("emb"), q))
            .orderBy(asc("distance"), asc("id"))
        case other => throw new IllegalArgumentException(s"unknown metric: $other")
      }
      scored.limit(k).select(col("id"), col("doc"), col("distance"))
    }
  }
}

/**
 * Encrypted twin of [[VectorStore]] — what the reference's CyborgDB stub
 * intends (/root/reference/src/cyborgdb_store.py:1-11): vectors encrypted at
 * rest so full-scan extraction yields ciphertext useless to an inversion
 * attack. Uses Spark's built-in `aes_encrypt`/`aes_decrypt` (GCM, random IV
 * per row) over the JSON-serialized embedding; the document is encrypted the
 * same way. Only `id` remains plaintext (the lookup key).
 *
 * Schema: (id STRING, doc_ct BINARY, emb_ct BINARY).
 */
final class EncryptedStore(spark: SparkSession, basePath: String, key: String) {
  require(Set(16, 24, 32).contains(key.length), "AES key must be 16/24/32 bytes")

  private def path(name: String): String = s"$basePath/$name"
  private val keyCol = lit(key)

  private def encrypt(c: Column): Column = aes_encrypt(c.cast(StringType), keyCol, lit("GCM"))

  private def decryptStr(c: Column): Column =
    aes_decrypt(c, keyCol, lit("GCM")).cast(StringType)

  /** Encrypt and store (id, doc, emb) rows. */
  def store(rows: DataFrame, name: String): Unit =
    rows.select(
      col("id").cast(StringType).as("id"),
      encrypt(col("doc")).as("doc_ct"),
      encrypt(to_json(col("emb"))).as("emb_ct"))
      .write.mode("overwrite").parquet(path(name))

  /** Full extraction WITHOUT the key: ciphertext only — the defense. */
  def extractSecure(name: String): DataFrame =
    spark.read.parquet(path(name)).select("id", "doc_ct", "emb_ct")

  /** Authorized read: decrypt back to (id, doc, emb). */
  def open(name: String): DataFrame =
    spark.read.parquet(path(name)).select(
      col("id"),
      decryptStr(col("doc_ct")).as("doc"),
      from_json(decryptStr(col("emb_ct")), ArrayType(FloatType)).as("emb"))

  /** kNN over the decrypted view (key holders only). */
  def query(name: String, queryEmb: Array[Float], k: Int): DataFrame = {
    val q = typedlit(queryEmb)
    open(name)
      .withColumn("distance", VF.l2Sq(col("emb"), q))
      .orderBy(asc("distance"), asc("id"))
      .limit(k)
      .select(col("id"), col("doc"), col("distance"))
  }
}
