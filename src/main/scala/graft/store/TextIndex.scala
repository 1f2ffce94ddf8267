package graft.store

import graft.functions.{TextFunctions => TF, TextHashOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persistent inverted text index — the BM25 counterpart of [[IvfIndex]]:
 * postings land `partitionBy("bucket")` where bucket = polyHash(term) mod
 * numBuckets, so a query reads ONLY the partition directories its terms
 * hash into (enforced by partition pruning / `PartitionFilters`, same
 * mechanism as the IVF cell probe). At 100 TB a q-term query scans
 * ~q/numBuckets of the postings, not the corpus; the reference pairs its
 * vector store with keyword search nowhere, but every hosted vector DB
 * ships BM25 hybrid ranking (see [[graft.queries.SearchQueries]]).
 *
 * Layout:
 *   `path/postings/bucket=B/` — (term, doc_id, tf, dl): dl is DENORMALIZED
 *     into the posting row so scoring never joins a doc-length table — the
 *     query is a pruned narrow scan + one doc-key aggregation.
 *   `path/_termstats/bucket=B/` — (term, df): per-term document frequency,
 *     bucket-pruned at query time, collected driver-side (≤ q rows) and
 *     folded into the scoring expression as idf literals.
 *   `path/_stats/` — one row (n_docs, sum_dl): exact integers, so the
 *     derived avgdl double is identical on any engine.
 *
 * Determinism: per-posting BM25 contributions are QUANTIZED to integers
 * (round(contrib · 2^20)) before the per-doc sum — integer addition is
 * commutative, so the distributed aggregation is exact and reproducible
 * bit-for-bit across partitionings and engines (the same recipe as
 * KMeans.trainQuantized), and ranking on the integer sum can never flip on
 * a 1-ulp libm divergence. Scores surface as sum/2^20 rounded to 4.
 *
 * Skew note (100 TB): stopword terms produce fat buckets; production
 * builds either drop df > cap terms at ingest or split hot buckets by
 * (bucket, doc_id range). Both compose with this layout; neither changes
 * the query shape.
 */
final class TextIndex(spark: SparkSession, path: String, numBuckets: Int) {

  require(numBuckets > 0, "numBuckets must be positive")

  private def postingsPath = s"$path/postings"
  private def termstatsPath = s"$path/_termstats"
  private def statsPath = s"$path/_stats"

  /** BM25 free parameters — shared with the in-memory scorer. */
  private val K1 = graft.queries.SearchQueries.K1
  private val B = graft.queries.SearchQueries.B
  /** Quantization scale: 2^20 ≈ 1e-6 score resolution. */
  val Scale = 1048576L

  private def bucketOf(term: String): Long =
    TextHashOps.polyHash(org.apache.spark.unsafe.types.UTF8String.fromString(term)) % numBuckets

  /** Build from (doc_id LONG, text STRING): tokenize, explode to postings
    * with per-(term, doc) tf and denormalized dl, bucket by term hash.
    * One explode + one (term, doc) aggregation — the standard posting
    * build shuffle, linear in token volume. */
  def build(docs: DataFrame): Unit = {
    val toks = docs.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
      .persist()
    try {
      val postings = toks
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(TF.polyHash(col("term")), lit(numBuckets.toLong)))
      postings.write.mode("overwrite").partitionBy("bucket").parquet(postingsPath)
      // df per term FROM the written postings (one read of what was just
      // materialized beats re-shuffling the token stream)
      spark.read.parquet(postingsPath)
        .groupBy("bucket", "term").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").partitionBy("bucket").parquet(termstatsPath)
      toks.agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"))
        .write.mode("overwrite").parquet(statsPath)
    } finally toks.unpersist(): Unit
  }

  /** Top-k docs for `terms` by quantized BM25. The postings read carries
    * BOTH the bucket filter (partition pruning — only the terms' bucket
    * dirs are listed) and the term filter (row-group pruning within); the
    * only shuffle is the per-doc sum over matching postings. Returns
    * (doc_id, dl, bm25q) ordered by the exact integer score. */
  def query(terms: Seq[String], k: Int): DataFrame = {
    val st = spark.read.parquet(statsPath).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n.toDouble
    val buckets = terms.map(bucketOf).distinct
    val dfMap: Map[String, Long] = spark.read.parquet(termstatsPath)
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    val idf: Map[String, Double] = terms.map { t =>
      val df = dfMap.getOrElse(t, 0L).toDouble
      t -> math.log((n.toDouble - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    val tf = col("tf").cast("double")
    val contrib = element_at(typedlit(idf), col("term")) *
      ((tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / lit(avgdl))))
    spark.read.parquet(postingsPath)
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .withColumn("cq", round(contrib * lit(Scale.toDouble)).cast("long"))
      .groupBy("doc_id", "dl").agg(sum(col("cq")).as("sq"))
      .orderBy(desc("sq"), asc("doc_id")).limit(k)
      .select(col("doc_id"), col("dl"),
        round(col("sq").cast("double") / lit(Scale.toDouble), 4).as("bm25q"))
  }
}
