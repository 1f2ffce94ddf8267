package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-benchmark of named registry queries (not driver contract).
  * Usage: runMain graft.tools.Prof [sfDir] [queryName ...] */
object Prof {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.queries.Registry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.queries.Registry.queries(name)(s, dir).count()
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    s.stop()
  }
}
