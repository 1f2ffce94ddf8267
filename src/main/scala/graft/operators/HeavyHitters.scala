package graft.operators

import graft.functions.CmsAtLeast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Exact heavy hitters with a count-min-sketch pruning pass. A plain
 * `groupBy(key).count().filter(n >= T)` shuffles EVERY distinct key; at
 * 100 TB the token/bigram key space is billions of groups of which a few
 * thousand matter. The CMS pass is one narrow scan producing a fixed-size
 * sketch (merged via treeAggregate — only the sketch crosses the wire), and
 * rows whose estimated count is below the threshold are dropped BEFORE the
 * aggregation shuffle.
 *
 * Correctness: CMS never under-counts (estimate >= true count), so the
 * pre-filter has NO false negatives; the exact groupBy + HAVING afterwards
 * removes the sketch's false positives. The result is therefore exactly the
 * plain query's — only the shuffle volume changes. Seeded, so task retries
 * see the same sketch. The probe is the codegen [[CmsAtLeast]] expression:
 * it dispatches on the key's type so sketch build and probe hash the same
 * representation (a probe typed differently from the build under-estimates
 * and WOULD drop true heavy hitters), and keeps the scan stage fully
 * whole-stage-codegen (no UDF barrier ahead of the shuffle).
 */
object HeavyHitters {

  /** Keys of `keyCol` (STRING or integral) occurring at least `minCount`
    * times, with exact counts. `eps`/`confidence` size the sketch
    * (width ~ 2.7/eps, depth ~ ln(1/(1-confidence))). */
  def exactHeavyHitters(items: DataFrame, keyCol: String, minCount: Long,
                        eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    // eager key-type check: fail at call time with a clear message, not at
    // analysis time inside the probe expression
    graft.functions.SketchKeyType.isStringKey(items.schema(keyCol).dataType, "exactHeavyHitters")
    val cms = items.stat.countMinSketch(keyCol, eps, confidence, seed = 42)
    items
      .filter(Bridge.column(CmsAtLeast(Bridge.expression(col(keyCol)), cms, minCount)))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
