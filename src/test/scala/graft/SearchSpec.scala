package graft

import graft.queries.{Registry, SearchQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Properties of the retrieval surface (SearchQueries): BM25 ranking
 * behavior, scalar-quantization soundness, and RRF fusion semantics.
 * The DuckDB oracle checks exact values; these specs check the
 * *retrieval-quality* invariants a value-hash can't express.
 */
class SearchSpec extends AnyFunSuite with SparkTest {

  private def run(name: String) = Registry.byName(name).fn(spark, sf001)

  test("q_ann_filtered only returns rows matching the pushed-down predicate") {
    val rows = run("q_ann_filtered").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => Set(2, 5, 7)(r.getAs[Number]("label").intValue())))
    assert(rows.forall(_.getLong(0) != 0L), "probe must be excluded")
  }

  test("q_ann_filtered filter reaches the parquet scan as PushedFilters") {
    val plan = run("q_ann_filtered").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(label"),
      s"label IN (...) not pushed to scan:\n$plan")
  }

  test("SQ8 codes are integers in [0,255] and self-distance is zero") {
    // quantize is the single source of truth shared with the query + oracle
    assert(SearchQueries.quantize(0.0, 0.0, 0.0) == 0L)   // degenerate dim
    assert(SearchQueries.quantize(1.0, 0.0, 1.0) == 255L) // max clamps
    assert(SearchQueries.quantize(0.0, 0.0, 1.0) == 0L)
    val mid = SearchQueries.quantize(0.5, 0.0, 1.0)
    assert(mid == 128L, s"mid-scale code was $mid")
  }

  test("SQ8 top-5 overlaps exact-L2 top-20 (quantization keeps neighborhood)") {
    import graft.functions.{VectorFunctions => VF}
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val probe = e.filter(col("vec_id") === 0).head().getAs[Seq[Float]]("embedding").toArray
    val exact20 = e.filter(col("vec_id") =!= 0)
      .withColumn("d", VF.l2Sq(col("embedding"), typedlit(probe)))
      .orderBy(asc("d"), asc("vec_id")).limit(20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sq5 = run("q_ann_sq8").collect().map(_.getLong(0)).toSet
    val overlap = (sq5 intersect exact20).size
    info(s"SQ8 top-5 ∩ exact top-20 = $overlap/5")
    assert(overlap >= 3, s"int8 quantization destroyed the neighborhood: $overlap/5")
  }

  test("BM25 top-10 docs all contain at least one query term") {
    val top = run("q_bm25").collect()
    assert(top.length == 10)
    val ids = top.map(_.getLong(0))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      assert(SearchQueries.QueryTerms.exists(docs(id).contains),
        s"doc $id in BM25 top-10 contains no query term")
    }
    // scores strictly positive and non-increasing in rank order
    val scores = top.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("MMR: first pick is pure-relevance argmax; diversity penalty works") {
    import graft.operators.Reranker
    import graft.operators.Reranker.Candidate
    val a = Array(1f, 0f, 0f, 0f)
    val aDup = Array(0.999f, 0.001f, 0f, 0f) // near-identical to a
    val b = Array(0f, 1f, 0f, 0f)            // orthogonal, lower relevance
    val pool = Seq(
      Candidate(1, 0.99, a), Candidate(2, 0.98, aDup), Candidate(3, 0.80, b))
    val sel = Reranker.mmr(pool, k = 2, lambda = 0.5)
    assert(sel.head._1 == 1, "first pick must be the relevance argmax")
    // 2's marginal score: .5*.98 - .5*~1.0 ≈ -0.01; 3's: .5*.80 - .5*0 = .40
    assert(sel(1)._1 == 3, "near-duplicate of pick 1 must lose to diverse doc")
    // determinism + bounded-k behavior
    assert(Reranker.mmr(pool, 2, 0.5) == sel)
    assert(Reranker.mmr(pool, 10, 0.5).map(_._1) == Seq(1L, 3L, 2L),
      "k beyond pool size returns the whole pool, diversity-ordered")
    // λ=1 degenerates to pure relevance order
    assert(Reranker.mmr(pool, 3, 1.0).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("q_mmr_rerank returns 5 deterministic picks from the top-20 shortlist") {
    val r1 = run("q_mmr_rerank").collect()
    assert(r1.length == 5)
    assert(r1.map(_.getInt(0)).toSeq == (1 to 5))
    val r2 = run("q_mmr_rerank").collect()
    assert(r1.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      r2.map(r => (r.getInt(0), r.getLong(1))).toSeq)
  }

  test("RRF fusion: a doc ranked in both legs beats same-rank single-leg docs") {
    val rows = run("q_hybrid_rrf").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val kw = r.getAs[Int]("rank_kw"); val sem = r.getAs[Int]("rank_sem")
      val expected =
        (if (kw > 0) 1.0 / (SearchQueries.RrfK + kw) else 0.0) +
          (if (sem > 0) 1.0 / (SearchQueries.RrfK + sem) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-6)
      assert(kw > 0 || sem > 0, "row from neither leg survived the outer join")
    }
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("MaxScore pruning: identical answer to the full BM25 scan, and it prunes") {
    import graft.queries.Registry
    for (sf <- Seq(sf0001, sf001)) {
      val full = Registry.queries("q_bm25")(spark, sf).collect().toSeq
      val pruned = Registry.queries("q_bm25_maxscore")(spark, sf).collect().toSeq
      assert(pruned == full, s"MaxScore must be lossless at $sf")
    }
    // measure the pruned fraction with the same bound math, independently:
    // UB(doc) = sum of idf(t)*(k1+1) over query terms present; theta = 10th
    // best exact score among docs containing the rarest term
    import graft.functions.{TextFunctions => TF}
    import graft.queries.SearchQueries.{B, K1, QueryTerms}
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val n = docs.count()
    val idf = QueryTerms.map { t =>
      val df = docs.filter(array_contains(col("toks"), t)).count()
      t -> math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    val avgdl = docs.agg(sum(col("dl").cast("long"))).head().getLong(0).toDouble / n
    val score = QueryTerms.map { t =>
      val tf = TF.termFreq(col("toks"), t).cast("double")
      lit(idf(t)) * ((tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / lit(avgdl))))
    }.reduce(_ + _)
    val rarest = QueryTerms.maxBy(idf)
    val theta = docs.filter(array_contains(col("toks"), rarest))
      .withColumn("sc", score).orderBy(desc("sc")).limit(10)
      .collect().map(_.getAs[Double]("sc")).min
    // per-term max impact (re-derived): max over docs of the term's exact
    // contribution — the bound the query's metadata pass computes
    val mc: Map[String, Double] = QueryTerms.map { t =>
      val tf = TF.termFreq(col("toks"), t).cast("double")
      val contrib = lit(idf(t)) * ((tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / lit(avgdl))))
      t -> docs.filter(array_contains(col("toks"), t))
        .agg(max(contrib)).head().getDouble(0)
    }.toMap
    val ub = QueryTerms.map(t =>
      when(array_contains(col("toks"), t), lit(mc(t))).otherwise(lit(0.0))).reduce(_ + _)
    val survivors = docs.filter(ub >= theta).count()
    val frac = 1.0 - survivors.toDouble / n
    info(f"pruned fraction at sf0.01 = $frac%.2f ($survivors of $n survive)")
    assert(frac > 0.5, s"the max-impact bound must prune most of the corpus, pruned only $frac")
  }
}
