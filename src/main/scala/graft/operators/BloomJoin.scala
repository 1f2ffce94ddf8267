package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-filter-pruned equi-join: build a bloom filter over the (already
 * filtered) dimension side's join keys, broadcast it, and drop fact rows
 * that cannot match BEFORE they reach the join's shuffle/exchange. The join
 * itself still runs, so false positives are eliminated exactly — the result
 * equals the plain join, row for row.
 *
 * Why this matters at 100 TB: when the dimension side is too big to
 * broadcast, the fact side must shuffle in full for a sort-merge join even
 * if only 1% of its rows survive. The bloom filter costs one aggregation
 * over the (small) dim keys plus a narrow scan-side filter, and cuts the
 * shuffled fact volume to (selectivity + fpp) of the input. Spark's own
 * runtime row-group filtering (spark.sql.optimizer.runtime.bloomFilter) does
 * this reactively inside AQE; this operator is the explicit, plannable form
 * for when the pruning must be guaranteed (or observed in a plan/spec).
 *
 * The filter is built distributed (`DataFrameStatFunctions.bloomFilter` runs
 * a treeAggregate — only the ~`-ln(fpp)·n/ln²2`-bit sketch reaches the
 * driver) and is deterministic (Murmur3, fixed seed), so task retries see
 * the same filter.
 */
object BloomJoin {

  /** Inner equi-join `fact ⋈ dim ON factKey = dimKey`, with the fact side
    * bloom-pruned first. `expectedDimKeys` sizes the filter; it may be an
    * upper bound (a loose bound only wastes bits, not correctness).
    *
    * Both key columns must be STRING or both integral: the filter is built
    * from the dim key's representation and probed with the fact key's via
    * the codegen [[graft.functions.BloomMightContain]] expression — a
    * string/long mix would hash incompatible representations and silently
    * drop matching fact rows (the r1 version probed everything as long,
    * which was only safe for the bigint call sites that existed then). */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    import graft.functions.{BloomMightContain, SketchKeyType}
    import org.apache.spark.sql.graftbridge.Bridge
    val factIsString = SketchKeyType.isStringKey(fact.schema(factKey).dataType, "prunedJoin fact key")
    val dimIsString = SketchKeyType.isStringKey(dim.schema(dimKey).dataType, "prunedJoin dim key")
    require(factIsString == dimIsString,
      s"prunedJoin: fact key $factKey and dim key $dimKey must both be STRING or both integral " +
        "— mixed types hash different sketch representations and drop matching rows")
    val bf = dim.stat.bloomFilter(dimKey, math.max(expectedDimKeys, 1L), fpp)
    fact.filter(Bridge.column(BloomMightContain(Bridge.expression(col(factKey)), bf)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
