package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Small-panel dispatch for the DataFrame-probe serving routes — the
 * [[graft.operators.KMeans.DriverSeedBound]] / adaptive-MaxScore-gate
 * discipline applied to panels: below the floor, a frame route COLLECTS
 * its panel and serves through its driver-panel twin, whose answers are
 * spec-pinned identical probe for probe. The frame lanes exist for fleets
 * past driver memory; under a driver-sized panel they pay a per-action
 * planning/scheduling constant (the r14 job profile: a 1-probe 3-hop
 * frame walk ran ~12 driver-blocking actions across ~55 AQE stage jobs —
 * ~3 s of wall for ~0.3 s of answer on the driver lane) that no data-side
 * tuning removes. Dispatching on measured panel size is the same
 * adaptivity the keyword bound's fanout floor ships: the optimal plan
 * depends on a quantity only known at serve time, so the route asks first.
 *
 * The floor rides session conf (the ProbeJoin.LimitKey discipline) so
 * specs pin the FRAME lanes by setting it to 0 (the shared test session
 * does) and servers size it to their driver heap. The probe never
 * collects more than floor+1 rows, so the ask is driver-bounded at ANY
 * panel size; an over-floor panel recomputes its (probe-sized, narrow)
 * plan in the frame lane — the double-compute is bounded by the floor
 * probe's early stop.
 */
private[graft] object PanelDispatch {

  /** Session-conf key for the dispatch floor (rows). 0 disables dispatch
    * (every panel takes the frame lane). */
  val FloorKey = "graft.panel.dfFloor"

  /** Default floor: comfortably driver-sized for every route's collected
    * panel shape (ids + embeddings + terms), well under the graph walk's
    * measured frame-lane crossover (~16k probes at the 100× fixture,
    * SURVEY §8.3). */
  val DefaultFloor = 1024L

  /** The collected panel when it holds at most `floor` rows; None above
    * the floor or when dispatch is disabled. */
  def smallPanel(spark: SparkSession, panel: DataFrame): Option[Array[Row]] = {
    val floor = spark.conf.get(FloorKey, DefaultFloor.toString).toLong
    if (floor <= 0L) None
    else {
      val head = panel.limit(math.min(floor + 1L, Int.MaxValue.toLong).toInt).collect()
      if (head.length <= floor) Some(head) else None
    }
  }

  /** The frame walks' duplicate-probe refusal, driver-side — same message
    * contract ("duplicate probe_id") as the in-frame guards, so callers
    * matching on the message see one refusal regardless of lane. */
  def requireUniqueProbes(rows: Array[Row], idField: String = "probe_id"): Unit = {
    val n = rows.length
    val nd = rows.iterator.map(_.getAs[Long](idField)).toSet.size
    require(nd == n,
      s"probe frame has duplicate probe_id rows ($n rows, $nd distinct ids) — " +
        "per-probe state would merge")
  }
}
