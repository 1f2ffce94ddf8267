package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton) clustering for multi-dimensional data skipping. Parquet
 * skips row groups via min/max stats, which only helps when rows filtered
 * together are stored together; sorting by one column destroys locality for
 * the other. Interleaving the bits of both keys gives a 1-D order in which
 * points close in EITHER dimension stay close, so a 2-D box predicate
 * touches a small, contiguous set of files/row-groups instead of all of
 * them. At 100 TB this is the difference between a selective two-column
 * scan reading ~selectivity of the data and reading all of it.
 *
 * The z-value is pure bit math (shift/and/multiply) — whole-stage codegen,
 * no UDF. Keys must be non-negative and fit in `bits` bits; rank-normalize
 * skewed keys first if stats-based skipping needs balanced cells.
 */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` as `numFiles` parquet files range-partitioned AND sorted by
    * the z-value of (`colA`, `colB`): each file covers a compact z-range, so
    * its per-column min/max stats are tight and box predicates prune. */
  def clusteredWrite(df: DataFrame, colA: String, colB: String,
                     numFiles: Int, path: String, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
