package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Queries are fully materialized through the `noop` sink — `count()` would
  * let Catalyst prune projections (a scan-only query's computed columns
  * would never execute) and under-report. A tiny untimed warmup query pays
  * the one-off JVM/codegen setup cost so per-query numbers reflect steady
  * state.
  *
  * Each query reports the MEDIAN of SPARK_GRAFT_BENCH_REPS runs (default
  * 3): a single-shot number is hostage to whatever else the machine is
  * doing — the round-2 driver recorded 128.6 s for a tree whose idle-machine
  * total was 62.5 s, with the inflation concentrated in queries whose code
  * had not changed. The median of three keeps one contended run from
  * dominating the recorded signal while staying robust to the occasional
  * fast outlier (a partially cached scan). */
object Bench {
  /** The guard's absolute noise floor in seconds: how far past the 2x
    * line a run must land before the flag fires. Sub-second queries can
    * DOUBLE on pure scheduler jitter (the r9 artifact of record flagged
    * q_dedup_simhash 0.59 -> 1.25 s with the code untouched since r6, a
    * contended 14% busy box, and no build phase for probeVerdict to
    * exonerate), so a relative-only rule flags noise it can never clear.
    * Half a second is the ceiling of the cross-round jitter observed on
    * sub-second queries in the r7-r9 driver runs. */
  private[graft] val NoiseFloorSec = 0.5

  /** Is `now` a SUSTAINED outlier against the committed artifact's `base`
    * for the same query? Flags only when `now` exceeds 2x the committed
    * number BY MORE THAN [[NoiseFloorSec]] — i.e. now > 2*base + 0.5 —
    * so a sub-second query must lose meaningful wall-clock, not just a
    * ratio, before the artifact calls it a regression (r9 verdict: give
    * the guard an absolute floor; the 0.59 -> 1.25 s jitter case must
    * clear, the r7 0.72 -> 2.75 s q_sessionize case must still flag).
    * `base` <= 0 disarms (no committed number: first run, new query, or
    * a failure recorded as -1). */
  private[graft] def sustainedOutlier(now: Double, base: Double): Boolean =
    base > 0 && now > 2.0 * base + NoiseFloorSec

  /** Probe-level exoneration for a vs_committed flag (r8 verdict: the
    * four flagged queries were all index-BUILD-inclusive compounds on a
    * contended box, but three had no subtimings so the guard could not
    * tell a small-file-IO build inflation from a serving regression).
    * When BOTH the current run and the committed artifact carry a
    * build-phase subtiming for the flagged query, compare the SERVING
    * (non-build) phase sum with the same sustained-outlier rule: if the
    * probe still matches the committed number, the compound flag is
    * build-side noise, not a serving regression. Every phase whose name
    * starts with `build` counts as build-side (q_rag_indexed's
    * `build_calibrate` sweep is attach-time corpus-scale work, not
    * serving). Returns (probe_now, probe_committed, exonerated); None
    * when either side lacks a build subtiming (no basis to exonerate). */
  private[graft] def probeVerdict(nowPhases: Option[Map[String, Double]],
      basePhases: Option[Map[String, Double]]): Option[(Double, Double, Boolean)] =
    for {
      now <- nowPhases if now.contains("build")
      base <- basePhases if base.contains("build")
    } yield {
      val pn = now.filterNot(_._1.startsWith("build")).values.sum
      val pb = base.filterNot(_._1.startsWith("build")).values.sum
      (pn, pb, !sustainedOutlier(pn, pb))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      } finally queries.Registry.releasePending()
      (System.nanoTime() - t0) / 1e9
    }
    // Contention guard (r6 verdict: a contended driver box recorded 90.0 s
    // for a tree whose quiet-box total was 57.9 s, with 7-10x inflation on
    // individual queries whose code had not changed). Two defenses:
    //  1. the artifact RECORDS the box state (load average at start/end,
    //     /proc/stat steal+busy deltas) so a reader can tell a contended
    //     artifact from a regression without re-running anything;
    //  2. any query whose rep spread (max/min) exceeds 2x is re-measured
    //     with a second batch of reps and reports the median of ALL runs —
    //     one stolen-CPU run can no longer drag a median of 3, and the
    //     re-measured names are listed in the artifact.
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    def procStat: Option[Array[Long]] =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try Some(src.getLines().next().split("\\s+").drop(1).map(_.toLong))
        finally src.close()
      } catch { case _: Throwable => None }
    val loadStart = loadAvg
    val statStart = procStat
    val respread = scala.collection.mutable.ArrayBuffer.empty[String]
    // Cross-run guard (r7 verdict: q_sessionize measured 2.75 s on the
    // driver box vs 0.54 s quiet with code untouched, yet sailed past the
    // in-run spread check — a query CONSISTENTLY slow during a contended
    // window has low spread). Defense: compare each median against the
    // COMMITTED artifact's number for the same query; a sustained >2x
    // outlier gets one extra batch of reps, and if still sustained is
    // FLAGGED in the artifact's vs_committed block — so a contended window
    // can no longer masquerade as a regression (or vice versa) without the
    // artifact saying so. The committed artifact is read with the repo's
    // zero-dependency JSON reader; absent/unreadable -> guard disarmed
    // (first run, renamed queries are simply unlisted).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "bench_queries.json")
    // one parse, two extractions: per-query medians (the flag baseline)
    // and per-query build/probe subtimings (the flag EXONERATION baseline)
    val (committed, committedSubs): (Map[String, Double], Map[String, Map[String, Double]]) = {
      import graft.functions.ChromaWhere._
      def nums(qs: Vector[(String, J)]): Map[String, Double] = qs.collect {
        case (k, JDbl(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
      }.toMap
      try parseJson(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(baselinePath)),
        java.nio.charset.StandardCharsets.UTF_8)) match {
        case JObj(fs) =>
          (fs.collectFirst { case ("queries", JObj(qs)) => nums(qs) }.getOrElse(Map.empty),
           fs.collectFirst { case ("subtimings", JObj(ss)) =>
             ss.collect { case (name, JObj(ph)) => name -> nums(ph) }.toMap
           }.getOrElse(Map.empty))
        case _ => (Map.empty, Map.empty)
      } catch { case _: Throwable => (Map.empty, Map.empty) }
    }
    val vsCommitted = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    def run(name: String): Double = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      // a failure anywhere (first batch or re-measurement) marks the query
      // failed — an intermittently crashing query must not hide behind a
      // healthy-looking median
      def batchOk(): Boolean = {
        var i = 0
        while (i < reps && times.forall(_ >= 0)) { times += runOnce(name); i += 1 }
        times.forall(_ >= 0)
      }
      if (!batchOk()) return -1.0
      // lower-middle median for EVEN sample counts (odd counts unchanged):
      // re-measured samples exist because contention was suspected, so the
      // tie must break toward the quiet-box number — with reps=1 the
      // upper-middle would return the CONTENDED first run even after a
      // fast confirming re-run, making the vs_committed flag unclearable
      def med = times.sorted.apply((times.length - 1) / 2)
      var remeasured = false
      if (reps > 1 && times.max / math.max(times.min, 1e-9) > 2.0) {
        respread += name
        remeasured = true
        if (!batchOk()) return -1.0
      }
      if (Bench.sustainedOutlier(med, committed.getOrElse(name, -1.0))) {
        if (!remeasured && !batchOk()) return -1.0
        if (Bench.sustainedOutlier(med, committed(name)))
          vsCommitted += ((name, med, committed(name)))
      }
      med
    }
    // Untimed warmup: one cheap scan plus one representative query per
    // family (text kernels, vector kernels) so the timed numbers reflect
    // steady-state execution — JIT-compiled kernels, loaded classes, warm
    // parquet footers — not first-query JVM setup. Queries still run cold
    // with respect to their own data/plans (nothing is cached).
    try {
      spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
      Seq("q_corpus_scan", "q_knn_cosine").foreach { n =>
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // build/probe sub-timings for the index-compound queries (the r5
    // verdict watch item: attribute drift to build or probe). Median of
    // the same rep count; failures degrade to an absent entry, never a
    // broken line.
    val subs = queries.BenchSplits.splits.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      try {
        val reps0 = (1 to reps).map { _ =>
          try f(spark, sfDir) finally queries.Registry.releasePending()
        }
        val phases = reps0.head.map(_._1)
        Some(name -> phases.map { ph =>
          val ts = reps0.map(_.toMap.apply(ph)).sorted
          ph -> ts(ts.length / 2)
        })
      } catch { case e: Throwable =>
        System.err.println(s"[bench] split $name failed: ${e.getMessage}"); None
      }
    }
    val subJson = subs.map { case (name, phases) =>
      "\"" + name + "\":" + phases.map { case (ph, v) => "\"" + ph + "\":" + v }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // /proc/stat first line: user nice system idle iowait irq softirq steal …
    // steal_pct = stolen ticks / total ticks over the bench window (non-zero
    // only under a hypervisor); busy_other_pct approximates how much of the
    // box's CPU the bench window spent NOT idle — on a quiet box this tracks
    // the bench's own usage, well above it means a noisy neighbor.
    val loadEnd = loadAvg
    val (stealPct, busyPct) = (statStart, procStat) match {
      case (Some(a), Some(b)) if a.length >= 8 && b.length >= 8 =>
        val d = b.zip(a).map { case (x, y) => (x - y).toDouble }
        val tot = math.max(d.sum, 1.0)
        (100.0 * d(7) / tot, 100.0 * (tot - d(3)) / tot)
      case _ => (-1.0, -1.0)
    }
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma decimal separator would corrupt the JSON line
    def pct(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val contention =
      s"""{"load_start":$loadStart,"load_end":$loadEnd,"cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""steal_pct":${pct(stealPct)},"busy_pct":${pct(busyPct)},""" +
      s""""respread":${respread.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val vsJson = {
      val subsNow: Map[String, Map[String, Double]] =
        subs.map { case (n, ph) => n -> ph.toMap }.toMap
      val flagged = vsCommitted.sortBy(_._1).map { case (n, now, base) =>
        val probe = Bench.probeVerdict(subsNow.get(n), committedSubs.get(n)) match {
          case Some((pn, pb, ok)) =>
            s""","probe_now":${pct(pn)},"probe_committed":${pct(pb)},"probe_exonerated":$ok"""
          case None => ""
        }
        "\"" + n + s"""":{"now":${pct(now)},"committed":${pct(base)}$probe}"""
      }.mkString("{", ",", "}")
      s"""{"baseline_queries":${committed.size},"flagged":$flagged}"""
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"subtimings":$subJson,"contention":$contention,"vs_committed":$vsJson,"sf":"$sfDir"}"""
    // stdout line for the driver, PLUS a whole-file copy: the r1 stdout tail
    // was truncated by log interleaving, losing 17 of 82 per-query times —
    // a file written in one shot survives intact for round-over-round
    // regression checks.
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    spark.stop()
  }
}
