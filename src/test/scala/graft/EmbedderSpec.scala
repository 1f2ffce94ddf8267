package graft

import graft.attack.Inversion
import graft.functions.{BatchedModelEmbedder, Embedder, HashEmbedder, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A deterministic stand-in for a real model: embeds by per-letter character
  * statistics — nothing like the hash kernel, so consumers provably run
  * through the seam, not a hidden hash path. Static counters observe model
  * loads and batch shapes (local mode = one JVM, so executors share them). */
object StubModel {
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  final class Model(val dim: Int)

  def encode(m: Model, texts: Seq[String]): Seq[Array[Float]] = {
    batchSizes.add(texts.length)
    texts.map { t =>
      val v = new Array[Float](m.dim)
      t.toLowerCase.foreach { c =>
        if (c >= 'a' && c <= 'z') v((c - 'a') % m.dim) += 1.0f
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0.0) v else v.map(x => (x / n).toFloat)
    }
  }

  def embedder(dim: Int, batchSize: Int = 16): Embedder = {
    val name = s"stub-$dim"
    new BatchedModelEmbedder[Model](name, dim,
      () => { loads.incrementAndGet(); new Model(dim) },
      encode, batchSize)
  }
}

class EmbedderSpec extends AnyFunSuite with SparkTest {

  test("HashEmbedder through the seam equals the inline hash pipeline") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val viaSeam = Embedder.knnByText(docs, "doc_id", "text", 0, 5, HashEmbedder(64))
      .collect().map(_.toSeq).toSeq
    val inline = {
      val d = docs
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .select(col("doc_id"), TF.hashEmbed(col("toks"), 64).as("emb"))
      val probe = d.filter(col("doc_id") === 0).select(col("emb").as("qe"))
      d.crossJoin(broadcast(probe)).filter(col("doc_id") =!= 0)
        .withColumn("cos_raw",
          graft.functions.VectorFunctions.cosine(col("emb"), col("qe")))
        .orderBy(desc("cos_raw"), asc("doc_id")).limit(5)
        .select(col("doc_id"), round(col("cos_raw"), 6).as("cos"))
        .collect().map(_.toSeq).toSeq
    }
    assert(viaSeam == inline)
    // embedOne agrees with the column kernel row for row
    val h = HashEmbedder(64)
    val rows = docs.limit(20)
      .select(col("text"), TF.hashEmbed(TF.tokens(col("text")), 64).as("e")).collect()
    rows.foreach { r =>
      assert(h.embedOne(r.getString(0)).toSeq == r.getSeq[Float](1).toSeq)
    }
  }

  test("stub model embedder runs q_embed_knn's pipeline: batched, loaded once, deterministic") {
    StubModel.loads.set(0)
    StubModel.batchSizes.clear()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val stub = StubModel.embedder(26, batchSize = 16)
    val r1 = Embedder.knnByText(docs, "doc_id", "text", 0, 5, stub)
      .collect().map(_.toSeq).toSeq
    val r2 = Embedder.knnByText(docs, "doc_id", "text", 0, 5, stub)
      .collect().map(_.toSeq).toSeq
    assert(r1.nonEmpty && r1 == r2, "stub-model kNN must be deterministic")
    // results really came from the stub, not the hash kernel
    val hash = Embedder.knnByText(docs, "doc_id", "text", 0, 5, HashEmbedder(26))
      .collect().map(_.toSeq).toSeq
    assert(r1 != hash, "stub embedding must actually be used")
    // model loaded once per JVM (executor cache), encode saw bounded batches
    assert(StubModel.loads.get() == 1,
      s"model must load once per executor JVM, loaded ${StubModel.loads.get()} times")
    val sizes = StubModel.batchSizes.toArray(Array.empty[Integer]).map(_.intValue)
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 16),
      s"encode batches must respect batchSize: ${sizes.toSeq}")
    assert(sizes.exists(_ > 1), "batching must actually batch")
  }

  test("attack loop runs end-to-end through a stub model embedder") {
    val p = Inversion.Params(popSize = 12, generations = 4, restarts = 2,
      iters = 15, topK = 10, dim = 26, seed = 7L)
    val stub = StubModel.embedder(26)
    val source = "spark query vector table"
    val target = stub.embedOne(source)
    val a = Inversion.invert(spark, target, p, Some(stub)).collect().map(_.toSeq).toSeq
    val b = Inversion.invert(spark, target, p, Some(stub)).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b, "attack through the seam must be bit-reproducible")
    // the attack optimizes the STUB's similarity: best score must be well
    // above a random phrase's (sanity that the loop consumed stub scores)
    val best = a.head(1).asInstanceOf[Double]
    val baseline = Inversion.cosine(stub.embedOne("zzz qqq"), target)
    assert(best > baseline, s"best=$best must beat unoptimized baseline=$baseline")
    assert(best > 0.5, s"four generations should reach decent similarity, got $best")
  }
}
