package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Column-level API over the vector expressions, plus SQL registration.
 *
 * Two implementations of each kernel:
 *  - `cosine / l2Sq / dot / norm`   — native codegen expressions (hot path)
 *  - `*Hof`                         — built-in higher-order-function
 *    compositions (`aggregate(zip_with(...))`), the reference implementation
 *    used by tests to cross-check the codegen kernels bit-for-bit.
 */
object VectorFunctions {

  private def expr2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                        org.apache.spark.sql.catalyst.expressions.Expression) =>
                       org.apache.spark.sql.catalyst.expressions.Expression)
                   (a: Column, b: Column): Column =
    Bridge.column(f(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine similarity in [-1, 1]; -1.0 on zero-norm input
    * (reference: /root/reference/src/app.py:52-59). */
  def cosine(a: Column, b: Column): Column = expr2(CosineSimilarity.apply)(a, b)

  /** Squared L2 distance — the reference store's kNN metric. */
  def l2Sq(a: Column, b: Column): Column = expr2(L2SquaredDistance.apply)(a, b)

  /** Dot product. */
  def dot(a: Column, b: Column): Column = expr2(DotProduct.apply)(a, b)

  /** L2 norm. */
  def norm(a: Column): Column =
    Bridge.column(VectorNorm(Bridge.expression(a)))

  /** IVF cell assignment: id of the squared-L2-nearest centroid, ties to the
    * lowest id. `cents` must be sorted by id ascending. */
  def nearestCentroid(emb: Column, cents: Array[(Long, Array[Float])]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(emb), cents.map(_._1), cents.map(_._2)))

  /** Fused projected squared L2: sum_j (dot(emb, planes(j)) - q(j))^2 as ONE
    * codegen loop nest (q_ann_jl's kernel) — bitwise equal to the unfused
    * `(dot(emb, lit(w_j)) - lit(q_j))^2` left-folded Add tree. */
  def projL2(emb: Column, planes: Array[Array[Float]], q: Array[Double]): Column =
    Bridge.column(ProjectedL2(Bridge.expression(emb), planes, q))

  /** Fused sign-random-projection LSH bucket over literal planes — bit p set
    * iff dot(emb, planes(p)) >= 0; NULL embeddings map to bucket 0 (the
    * when/otherwise tree this replaces summed its branch fallbacks to 0). */
  def lshBucket(emb: Column, planes: Array[Array[Float]]): Column =
    coalesce(Bridge.column(LshSignBucket(Bridge.expression(emb), planes)), lit(0L))

  /** Pack m nibble PQ codes (BINARY) into one LONG code word. */
  def pqPack(codes: Column): Column =
    Bridge.column(PqCodePack(Bridge.expression(codes)))

  /** SQ8 quantization encode: ARRAY<FLOAT> -> BINARY codes through frozen
    * per-dim (min, max) index metadata (persistent IVF scan path). */
  def sq8Encode(emb: Column, mn: Array[Double], mx: Array[Double]): Column =
    Bridge.column(Sq8Encode(Bridge.expression(emb), mn, mx))

  /** Integer squared L2 over two SQ8 code BINARYs — exact, codegen. */
  def sq8L2(a: Column, b: Column): Column = expr2(Sq8L2Distance.apply)(a, b)

  /** PQ encode: ARRAY<FLOAT> -> m-byte BINARY codes through a flattened
    * codebook tensor (persistent IVF 32x scan path). */
  def pqEncode(emb: Column, books: Array[Float], m: Int, k: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(emb), books, m, k))

  /** ADC score over PQ code BINARYs against a driver-computed LUT. */
  def pqAdc(codes: Column, lut: Array[Double], k: Int): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), lut, k))

  /** ADC score with the LUT as a column (batch probes: one LUT per probe
    * row). */
  def pqAdcPair(codes: Column, lut: Column, k: Int): Column =
    Bridge.column(PqAdcPair(Bridge.expression(codes), Bridge.expression(lut), k))

  /** ADC score directly from (codes, query vector) — distributed probe
    * frames where no per-probe driver LUT exists. */
  def pqAdcDirect(codes: Column, qe: Column, books: Array[Float], k: Int): Column =
    Bridge.column(PqAdcDirect(Bridge.expression(codes), Bridge.expression(qe), books, k))

  // ---- reference implementations via built-in higher-order functions ----

  private def asDouble(x: Column): Column = x.cast("double")

  /** Sequential left-fold sum in DOUBLE — same accumulation order as the
    * codegen kernels, so results are bitwise identical. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => asDouble(x) * asDouble(y)))

  def l2SqHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => {
      val d = asDouble(x) - asDouble(y)
      d * d
    }))

  def normSqHof(a: Column): Column =
    foldSum(zip_with(a, a, (x, y) => asDouble(x) * asDouble(y)))

  def cosineHof(a: Column, b: Column): Column = {
    val na = normSqHof(a)
    val nb = normSqHof(b)
    when(na === 0.0 || nb === 0.0, lit(-1.0))
      .otherwise(dotHof(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** L2-normalize a float vector (zero vector passes through unchanged). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  /** Register `cosine_sim`, `l2_sq`, `dot_product`, `vec_norm` for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_sq", es => L2SquaredDistance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm", es => VectorNorm(es.head), "scala_udf")
  }
}
