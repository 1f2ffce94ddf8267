package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. A plain shuffle join sends every row of
 * a hot key to ONE reducer; salting fans each probe row to one of `salts`
 * sub-partitions of its key and replicates the build side across all of
 * them, so a hot key spreads over `salts` tasks at the cost of
 * `salts x |build|` shuffle volume on the (smaller) build side.
 *
 * The salt is a deterministic hash of the whole probe row — no `rand()`,
 * so task retries and speculative execution reproduce the same assignment.
 *
 * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles the same
 * problem reactively for sort-merge joins; this operator is for when the
 * skew is known ahead of time or AQE cannot kick in (e.g. the build side is
 * already broadcast-sized but the probe's post-join distribution matters).
 */
object SkewJoin {

  /** Inner equi-join of `probe` (large, skewed) with `build` (small enough
    * to replicate `salts` times) on `key`. Result equals
    * `probe.join(build, key)` exactly. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
