package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: prints the formatted physical plan of named
  * queries (all when unnamed) for pushdown/join-strategy review. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_point_get", "q_pricing_summary", "q_knn_cosine", "q_top_customers", "q_extract_all")
    names.foreach { n =>
      println(s"##### $n")
      graft.queries.Registry.queries(n)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
