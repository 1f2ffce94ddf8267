package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job-level profiler (r14): runs named registry queries (or
  * BenchSplits phases) with a listener that prints every Spark job's
  * wall-clock, task count and description — the attribution layer the
  * bench's per-query numbers lack (guide §1: decide whether time goes to
  * shuffle, compute, or scheduling BEFORE touching anything). Not driver
  * contract.
  *
  * Usage: runMain graft.tools.JobProf <sfDir> <query> [query ...]
  */
object JobProf {

  private final case class JobRow(id: Int, desc: String, start: Long,
                                  var end: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .getOrElse(j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct.mkString(" | "))
        val tasks = j.stageInfos.map(_.numTasks).sum
        jobs.put(j.jobId, JobRow(j.jobId, desc, j.time, -1L, tasks)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId)
        if (r != null) r.end = j.time
      }
    })
    // warmup (the bench's discipline: steady-state JIT, warm footers)
    try {
      s.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
      Seq("q_corpus_scan", "q_knn_cosine").foreach { n =>
        graft.queries.Registry.queries(n)(s, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    } catch { case _: Throwable => () }
    names.foreach { n =>
      jobs.clear()
      val t0 = System.nanoTime()
      try {
        graft.queries.BenchSplits.splits.get(n) match {
          case Some(f) =>
            val phases = f(s, sfDir)
            println(f"== $n total ${(System.nanoTime() - t0) / 1e9}%.2f s " +
              phases.map { case (p, t) => f"$p=$t%.2f" }.mkString(" "))
          case None =>
            graft.queries.Registry.queries(n)(s, sfDir)
              .write.format("noop").mode("overwrite").save()
            println(f"== $n total ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } catch { case e: Throwable =>
        println(s"== $n FAILED: ${e.getMessage}")
      } finally graft.queries.Registry.releasePending()
      import scala.jdk.CollectionConverters._
      val rows = jobs.values.asScala.toSeq.sortBy(_.id)
      val tot = rows.filter(_.end > 0).map(r => r.end - r.start).sum
      println(f"   jobs=${rows.size} jobTimeSum=${tot / 1e3}%.2f s")
      rows.foreach { r =>
        val d = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        println(f"   job ${r.id}%3d ${d}%7.3f s tasks=${r.tasks}%4d ${r.desc.take(90)}")
      }
    }
    s.stop()
  }
}
