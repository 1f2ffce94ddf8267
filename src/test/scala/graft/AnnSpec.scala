package graft

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.queries.Registry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite with SparkTest {

  test("hashEmbed: unit norm, deterministic, zero-token guard") {
    import spark.implicits._
    val df = Seq("spark sql vector search", "spark sql vector search", "", "totally different words here")
      .toDF("text")
      .select(TF.hashEmbed(TF.tokens(col("text")), 64).as("emb"))
      .select(col("emb"), VF.norm(col("emb")).as("n"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-6)
    assert(rows(0).getSeq[Float](0) == rows(1).getSeq[Float](0), "same text -> same embedding")
    assert(rows(2).getDouble(1) == 0.0, "no tokens -> zero vector")
    assert(rows(0).getSeq[Float](0) != rows(3).getSeq[Float](0))
  }

  test("hashEmbed: cosine structure — shared tokens score higher") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps"),
      ("b", "the quick brown fox leaps"),
      ("c", "completely unrelated sentence entirely")).toDF("id", "text")
      .select(col("id"), TF.hashEmbed(TF.tokens(col("text")), 64).as("emb"))
    val e = df.collect().map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot // unit vectors
    }
    assert(cos(e("a"), e("b")) > cos(e("a"), e("c")))
  }

  test("IVF and LSH results agree with brute-force ranking (recall sanity)") {
    val dir = sf001
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qe = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).toArray
    val brute = e.withColumn("d", VF.l2Sq(col("embedding"), typedlit(qe)))
      .orderBy(asc("d"), asc("vec_id")).limit(50)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    val ivf = Registry.queries("q_ann_ivf")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.nonEmpty)
    assert((ivf -- brute).isEmpty, s"IVF returned ids outside brute-force top-50: ${ivf -- brute}")

    val lsh = Registry.queries("q_ann_lsh")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty, "LSH probe bucket should contain at least one neighbor")
  }
}
