package graft

import graft.store.{TextIndex, VectorStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hot-tier admission budget (`graft.hot.maxBytes`): the Graph/IVF hot
 * tiers pin a whole index in JVM memory and the text tier grows a
 * per-term cache — serving-sized is fine, 100 TB is an OOM. Routing must
 * therefore consult the byte budget: over budget, `Collection.query`
 * falls back to the Spark pruned path (same answers, bounded memory);
 * under budget it serves hot. The TextIndex term cache must stay
 * byte-bounded no matter how many distinct terms are probed.
 */
class HotBudgetSpec extends AnyFunSuite with SparkTest {

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  private def withBudget[A](bytes: Long)(body: => A): A = {
    val prev = System.getProperty("graft.hot.maxBytes")
    System.setProperty("graft.hot.maxBytes", bytes.toString)
    try body
    finally {
      if (prev == null) System.clearProperty("graft.hot.maxBytes")
      else System.setProperty("graft.hot.maxBytes", prev)
    }
  }

  private lazy val rows = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").cast("string").as("id"),
      concat(lit("doc "), col("vec_id")).as("doc"),
      map(lit("label"), col("label").cast("string")).as("meta"),
      col("embedding").as("emb"))

  private lazy val probe = spark.read.parquet(s"$sf001/embeddings.parquet")
    .filter(col("vec_id") === 17).head().getAs[Seq[Float]]("embedding").toArray

  private def got(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.select("id", "distance").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(p => (p._2, p._1))

  test("IVF routing over budget falls back to the Spark path with identical answers") {
    val store = new VectorStore(spark, tmp("vs_bud_ivf"))
    val c = store.createOrGet("col")
    c.add(rows)
    c.attachIvfIndex(tmp("vs_bud_ivf_idx"), numCells = 8, nprobe = 8)

    val hot = withBudget(Long.MaxValue)(got(c.query(probe, k = 5)))
    val cold = withBudget(1L)(got(c.query(probe, k = 5)))
    assert(hot == cold && hot.nonEmpty,
      "over-budget routed query must serve the same answers from the Spark path")
  }

  test("graph routing over budget falls back to the Spark walk with identical answers") {
    val store = new VectorStore(spark, tmp("vs_bud_g"))
    val c = store.createOrGet("col")
    c.add(rows.filter(col("id").cast("long") <= 200))
    def bucketOf(off: Int)(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 6).map { p =>
        when(graft.functions.VectorFunctions.dot(
          e, typedlit(graft.queries.AnnQueries.plane(off + p))) >= 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    c.attachGraphIndex(tmp("vs_bud_g_idx"), k = 4,
      Seq(bucketOf(0) _, bucketOf(200) _), beamWidth = 8, hops = 3)

    val hot = withBudget(Long.MaxValue)(got(c.query(probe, k = 5)))
    val cold = withBudget(1L)(got(c.query(probe, k = 5)))
    assert(hot == cold && hot.nonEmpty,
      "over-budget routed graph query must serve the same answers from the Spark walk")
  }

  test("text hot tier's term cache stays byte-bounded across a wide query vocabulary") {
    val docs = spark.range(0, 300)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("term"), col("id") % 40),
          concat(lit("term"), (col("id") + 1) % 40),
          lit("shared common filler words here")).as("text"))
    val idx = new TextIndex(spark, tmp("tidx_bud"), numBuckets = 4)
    idx.build(docs)

    // tiny budget: every hotQuery over a fresh term can trigger a
    // generation flip, but answers must stay identical to the cold path
    // and the resident cache must never exceed a couple of terms
    withBudget(256L) {
      (0 until 40).foreach { i =>
        val terms = Seq(s"term$i", "shared")
        val hot = idx.hotQuery(terms, 5)
        val cold = idx.query(terms, 5).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
        assert(hot == cold, s"hot/cold divergence at term$i under a tiny budget")
      }
      // the cache reset keeps only the most recent generation
      val f = idx.getClass.getDeclaredMethods.find(_.getName == "hotState").get
      f.setAccessible(true)
      val h = f.invoke(idx)
      val postings = h.getClass.getDeclaredMethods
        .find(_.getName == "postings").get.invoke(h)
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, AnyRef]]
      assert(postings.size <= 4,
        s"term cache must be generation-bounded under the budget, saw ${postings.size}")
    }
  }
}
