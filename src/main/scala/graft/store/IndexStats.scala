package graft.store

/**
 * Maintenance introspection for the disk indexes — the numbers an
 * auto-compaction policy (or an operator's dashboard) decides on:
 *
 *  - `liveRows`: rows a query can currently return (physical minus
 *    pending tombstones);
 *  - `pendingDeletes`: tombstoned rows not yet physically purged — each
 *    one costs an anti-join row (IVF), a dropped-src check (graph), or a
 *    stats correction (text) at query time until `compact()`;
 *  - `units`: committed publish units (delta epochs / batch dirs) —
 *    partition-discovery and merge fan-in grow with this, the other
 *    reason to compact.
 *
 * Gathering stats runs bounded Spark work (counts over the index tree,
 * never the source corpus) — maintenance-cadence cost, not probe cost.
 */
final case class IndexStats(liveRows: Long, pendingDeletes: Long, units: Int) {
  def pendingRatio: Double =
    if (liveRows <= 0L) (if (pendingDeletes > 0) Double.PositiveInfinity else 0.0)
    else pendingDeletes.toDouble / liveRows.toDouble
}

/**
 * Cell-geometry health of an [[IvfIndex]] — the retrain-trigger numbers
 * (see `IvfIndex.balance` for semantics). Kept separate from
 * [[IndexStats]]: computing it reads the emb column (one narrow pass),
 * where [[IndexStats]] is counts only, and only the IVF index has cells.
 */
final case class IvfBalance(liveRows: Long, liveCells: Int,
                            maxOverMean: Double, sq8ClipRate: Double,
                            pqErrRatio: Double = 0.0)
