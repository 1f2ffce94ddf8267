package graft.functions

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Pluggable text-embedding seam (reference F3, SURVEY.md §2.8): the
 * reference's embedder is a real model (SentenceTransformer MiniLM,
 * /root/reference/src/embeddings.py:3) behind a `texts -> vectors` surface.
 * This trait is that surface for the engine: every consumer (q_embed_knn's
 * pipeline shape, the inversion attack loop) takes an [[Embedder]], so a
 * user with ONNX MiniLM weights drops them in via [[BatchedModelEmbedder]]
 * without touching any query — [[HashEmbedder]] stays the hermetic default
 * (deterministic, codegen, oracle-verifiable).
 */
trait Embedder extends Serializable {
  def dim: Int

  /** Append `outCol` (ARRAY<FLOAT>, width [[dim]]) embedding `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame

  /** One text — for driver/executor-local loops (the greedy hill-climb
    * embeds one candidate per step, /root/reference/src/app.py:192). */
  def embedOne(text: String): Array[Float]
}

object Embedder {
  /** The q_embed_knn pipeline shape, embedder-agnostic: embed the corpus,
    * probe with row `probeId`'s embedding, exact cosine top-k of the rest.
    * One narrow embed pass + broadcast probe + TakeOrderedAndProject —
    * the plan is identical whichever embedder runs the map stage. */
  def knnByText(docs: DataFrame, idCol: String, textCol: String,
                probeId: Long, k: Int, embedder: Embedder): DataFrame = {
    val embedded = embedder.embed(docs.select(col(idCol), col(textCol)), textCol, "emb")
    // the probe embeds via embedOne on its fetched text — filtering the
    // embedded frame instead would run the (model) encode pass over the
    // whole corpus a second time just to keep one row, since the predicate
    // cannot push below a mapPartitions embed stage
    val probeRow = docs.filter(col(idCol) === probeId)
      .select(col(textCol)).limit(1).collect().headOption
    if (probeRow.isEmpty) // unknown probe id -> empty result, not a throw
      return embedded.filter(lit(false))
        .select(col(idCol), lit(0.0).as("cos")).limit(0)
    val probeText = Option(probeRow.get.getString(0)).getOrElse("")
    val qe = typedlit(embedder.embedOne(probeText))
    embedded
      .filter(col(idCol) =!= probeId)
      .withColumn("cos_raw", VF.cosine(col("emb"), qe))
      .orderBy(desc("cos_raw"), asc(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cos"))
  }
}

/** Hermetic default: the codegen hashing embedder ([[HashEmbed]] kernel —
  * tokenize → hash-bucket counts → L2 normalize). Capability parity with
  * the reference's encoder (text → fixed-dim similarity-preserving vector);
  * bit-reproducible, so oracle queries stay hash-verifiable. */
final case class HashEmbedder(dim: Int) extends Embedder {

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, TF.hashEmbed(TF.tokens(col(textCol)), dim))

  override def embedOne(text: String): Array[Float] = {
    // probe/corpus embedding parity holds by CONSTRUCTION: the driver path
    // runs the same TextHashOps.tokenize kernel the codegen Tokenize
    // expression runs (a reimplemented lowering — even Locale.ROOT — can
    // diverge from UTF8String.toLowerCase on non-ASCII input)
    val toks = TextHashOps.tokenize(UTF8String.fromString(text))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
    TextHashOps.hashEmbed(toks, dim)
  }
}

object BatchedModelEmbedder {
  // executor-JVM-wide model cache: the model loads ONCE per executor no
  // matter how many tasks deserialize the embedder (the broadcast-model
  // pattern; the closure itself only carries the loader)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private[functions] def getOrLoad[M](key: String, load: () => M): M =
    cache.computeIfAbsent(key, _ => load().asInstanceOf[AnyRef]).asInstanceOf[M]
}

/** Model-backed embedder — the slot where real weights (ONNX MiniLM etc.)
  * plug in. `loadModel` runs once per executor JVM, cached under
  * `(name, dim)` — `name` must identify the model ARTIFACT (two embedders
  * sharing a key share whichever model loaded first);
  * `encodeBatch` maps a batch of texts to `dim`-width vectors and is called
  * with at most `batchSize` texts at a time inside `mapPartitions` — the
  * batched executor-side shape the reference's own encoder uses
  * (model.encode over a list, /root/reference/src/embeddings.py:5-6; the
  * same stage pattern as Reconstruct's pluggable LLM call). */
final class BatchedModelEmbedder[M](
    name: String,
    override val dim: Int,
    loadModel: () => M,
    encodeBatch: (M, Seq[String]) => Seq[Array[Float]],
    batchSize: Int = 64) extends Embedder {
  require(batchSize > 0, "batchSize must be positive")

  private def model: M = BatchedModelEmbedder.getOrLoad(s"$name/dim=$dim", loadModel)

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema
      .add(StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val bs = batchSize
    df.mapPartitions { it =>
      val m = model
      it.grouped(bs).flatMap { batch =>
        val vecs = encodeBatch(m, batch.map(_.getString(idx)))
        require(vecs.length == batch.length, "encodeBatch must return one vector per text")
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(Encoders.row(outSchema))
  }

  override def embedOne(text: String): Array[Float] =
    encodeBatch(model, Seq(text)).head
}
