package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Dev-only bisect of shingle-set materialization cost. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    def mk = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), TF.shingles(col("toks"), 3).as("sg"))
      .select(col("doc_id"), col("lang"),
        array_sort(array_distinct(TF.tokenHashes(col("sg")))).as("sh"))

    time("compute only (agg size)")(mk.select(sum(size(col("sh")))).count())
    time("compute only (noop write)") { mk.write.format("noop").mode("overwrite").save(); 0L }
    val d1 = mk.persist()
    time("persist")(d1.count())
    d1.unpersist(true)
    time("localCheckpoint") { mk.localCheckpoint(true).count() }
    def raw = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), TF.shingles(col("toks"), 3).as("sg"))
    val d2 = raw.select(col("doc_id"), TF.tokenHashes(col("sg")).as("th")).persist()
    time("persist hashes (no sort)")(d2.count())
    d2.unpersist(true)
    val d3 = raw.persist()
    time("persist shingle strings")(d3.count())
    d3.unpersist(true)
    val d4 = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks")).persist()
    time("persist tokens only")(d4.count())
    d4.unpersist(true)
    s.stop()
  }
}
