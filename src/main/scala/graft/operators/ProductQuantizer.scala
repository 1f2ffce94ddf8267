package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Product quantization over ARRAY<FLOAT> columns: split each vector into
 * `m` contiguous subspaces, learn a `k`-codeword codebook per subspace with
 * Lloyd's k-means, encode vectors as m small codes, and score queries with
 * an asymmetric-distance lookup table (ADC) that never touches raw vectors.
 *
 * Scale shape (the reason PQ exists at 100 TB):
 *  - training: each Lloyd round is ONE narrow assignment pass (the fused
 *    [[graft.functions.NearestCentroid]] argmin per subspace) plus one hash
 *    aggregate producing k rows per subspace — the shuffle carries
 *    m*k*subDim doubles total, independent of corpus size;
 *  - encoding: narrow map, m codes per row (4-bit codes at k=16);
 *  - query: the m x k LUT is computed on the driver and folded into the
 *    plan; scoring is m literal-array lookups per row, zero shuffle.
 *
 * Codebook layout: `codebooks(m)` is an id-sorted array of (code, codeword).
 */
object ProductQuantizer {

  type Codebooks = Array[Array[(Long, Array[Float])]]

  /** Lloyd's k-means per subspace. `init(m)` supplies the per-subspace seed
    * codewords (deterministic seeding keeps runs reproducible; k-means++
    * would need a random source). Empty cells keep their previous codeword. */
  def train(vectors: DataFrame, embCol: String, m: Int, k: Int, iters: Int): Codebooks = {
    val dim = vectors.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // seed: subvectors of the first k rows in the frame's order — pass a
    // sorted frame (e.g. orderBy id) for reproducible codebooks
    val seedRows = vectors.select(col(embCol)).limit(k).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seedRows.length == k, s"need at least $k rows to seed $k codewords")

    (0 until m).map { mi =>
      val lo = mi * subDim
      var cb: Array[(Long, Array[Float])] =
        seedRows.zipWithIndex.map { case (v, i) => (i.toLong, v.slice(lo, lo + subDim)) }
      val sub = slice(col(embCol), lo + 1, subDim)
      for (_ <- 0 until iters) {
        val aggs = count(lit(1)).as("n") +:
          (0 until subDim).map(d => avg(element_at(col("sv"), d + 1)).as(s"d$d"))
        val means = vectors
          .select(VF.nearestCentroid(sub, cb).as("code"), sub.as("sv"))
          .groupBy("code")
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => r.getLong(0) -> Array.tabulate(subDim)(d => r.getDouble(d + 2).toFloat))
          .toMap
        cb = cb.map { case (code, old) => (code, means.getOrElse(code, old)) }
      }
      cb
    }.toArray
  }

  /** The codebook tensor FLATTENED code-sorted — the layout the codegen
    * kernels ([[graft.functions.PqEncode]]/[[graft.functions.PqAdc]])
    * index as [(mi*k + code)*subDim + d]. */
  def flatten(codebooks: Codebooks): Array[Float] =
    codebooks.flatMap(cb => cb.sortBy(_._1).flatMap(_._2))

  /** The query-side ADC lookup table, flattened [mi*k + code]: per
    * subspace, squared L2 from the probe's subvector to every codeword —
    * m·k doubles, driver-computed once per probe and folded into the plan
    * as a literal (the persistent-index twin of [[adcColumn]]'s LUT). */
  def adcLut(probe: Array[Float], codebooks: Codebooks): Array[Double] = {
    val subDim = codebooks(0).head._2.length
    codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.sortBy(_._1).map { case (_, cw) =>
        var acc = 0.0; var i = 0
        while (i < subDim) {
          val d = probe(mi * subDim + i).toDouble - cw(i).toDouble
          acc += d * d; i += 1
        }
        acc
      }
    }
  }

  /** Append code columns `c0..c{m-1}` (nearest codeword per subspace). */
  def encode(df: DataFrame, embCol: String, codebooks: Codebooks): DataFrame = {
    val subDim = codebooks(0).head._2.length
    codebooks.zipWithIndex.foldLeft(df) { case (acc, (cb, mi)) =>
      acc.withColumn(s"c$mi",
        VF.nearestCentroid(slice(col(embCol), mi * subDim + 1, subDim), cb))
    }
  }

  /** ADC column: approximate squared L2 distance from `probe` to an encoded
    * row, as the sum of m lookup-table reads over the code columns. */
  def adcColumn(probe: Array[Float], codebooks: Codebooks): Column = {
    val subDim = codebooks(0).head._2.length
    val lut: Array[Array[Double]] = codebooks.zipWithIndex.map { case (cb, mi) =>
      cb.map { case (_, cw) =>
        var acc = 0.0; var i = 0
        while (i < subDim) {
          val d = probe(mi * subDim + i).toDouble - cw(i).toDouble
          acc += d * d; i += 1
        }
        acc
      }
    }
    // code ids are 0..k-1 (id-sorted codebook), so code+1 indexes the LUT
    lut.zipWithIndex.map { case (row, mi) =>
      element_at(typedlit(row), col(s"c$mi").cast("int") + 1)
    }.reduce(_ + _)
  }

  /** Two-stage search: ADC shortlist of `k * shortlistFactor` candidates from
    * the compressed codes, then exact L2 re-rank of just the shortlist to the
    * final top-k. This is how PQ is deployed in practice — the cheap code scan
    * bounds how many raw vectors the exact pass ever touches, so the refine
    * cost is O(k·factor) regardless of corpus size. `encoded` must carry the
    * code columns from [[encode]] plus the raw `embCol` and an `idCol` used
    * as the deterministic tiebreak. */
  def searchRefined(encoded: DataFrame, embCol: String, idCol: String,
                    probe: Array[Float], codebooks: Codebooks,
                    k: Int, shortlistFactor: Int = 5): DataFrame = {
    val shortlist = encoded
      .withColumn("adc", adcColumn(probe, codebooks))
      .orderBy(asc("adc"), asc(idCol))
      .limit(k * shortlistFactor)
    shortlist
      .withColumn("dist", VF.l2Sq(col(embCol), typedlit(probe)))
      .orderBy(asc("dist"), asc(idCol))
      .limit(k)
      .drop("adc")
  }
}
