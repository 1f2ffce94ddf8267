package graft.queries

import graft.operators.{KnnGraph, Percolate}
import graft.queries.Registry.tbl
import graft.store.{Envelope, IvfIndex, TextIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * BUILD/PROBE sub-timings for the three registry queries that time an
 * index construction and its first probe as ONE number (q_text_index,
 * q_ivf_index, q_ann_graph_search) — the round-5 verdict watch item: a
 * SERVING regression can hide inside the compound (the 2.56→3.61 s
 * q_text_index drift was unattributable). Bench runs these after the
 * main sweep and emits them as `subtimings` in bench_queries.json, so
 * round-over-round diffs attribute drift to the build or the probe.
 *
 * Each split replays the registered query's exact work — same index
 * parameters, same probe — with a timing fence between the phases
 * (builds are forced to completion before the probe clock starts).
 */
object BenchSplits {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** name -> phases (ordered). Values are seconds. */
  val splits: Map[String, (SparkSession, String) => Seq[(String, Double)]] = Map(
    "q_text_index" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_tidx_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.query(SearchQueries.QueryTerms, 10)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ivf_index" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_ivf_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val qe = vectors.filter(col("id") === 0).head().getSeq[Float](1).toArray
      val (_, tp) = timed(
        idx.query(qe, k = 5, nprobe = 4)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ivf_sq8_probe" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_sq8_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val qe = vectors.filter(col("id") === 0).head().getSeq[Float](1).toArray
      val (_, tp) = timed(
        idx.queryQuantized(qe, k = 5, nprobe = 4, shortlist = 64)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_rag_indexed" -> { (s, dir) =>
      // three phases: the corpus pass (chunk+embed+build), the bounded
      // calibration sweep, and the serving probe — the number that must
      // stay ~flat as the corpus grows (the exact arm q_rag_retrieve is
      // the linear-cost comparison)
      val (idx, tb) = timed(SearchQueries.ragBuildIndex(s, dir))
      val (probes, _) = timed(SearchQueries.ragProbePanel(s))
      val (depth, tc) = timed(SearchQueries.ragCalibrate(idx, probes))
      val (_, tp) = timed(
        SearchQueries.ragServeIndexed(s, idx, probes, depth)
          .write.format("noop").mode("overwrite").save())
      // the build_ prefix keeps the calibration sweep (attach-time,
      // corpus-scale work) OUT of Bench.probeVerdict's serving-phase sum
      Seq("build" -> tb, "build_calibrate" -> tc, "probe" -> tp)
    },
    "q_hybrid_indexed" -> { (s, dir) =>
      // both persisted arms built in-query (bench-honest), the fused
      // probe is the number that must stay ~flat as the corpus grows
      val ((tidx, vidx), tb) = timed(SearchQueries.hybridBuildIndexes(s, dir))
      val (qe, _) = timed(SearchQueries.hybridProbe(s))
      val (depths, tc) = timed(SearchQueries.hybridCalibrate(vidx, qe))
      val (_, tp) = timed(
        SearchQueries.hybridServeIndexed(s, tidx, vidx, qe, depths)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "build_calibrate" -> tc, "probe" -> tp)
    },
    "q_hybrid_batch" -> { (s, dir) =>
      // the panel twin of q_hybrid_indexed's split: build both persisted
      // arms, calibrate the panel's depths once, then the fused panel
      // probe — the number that must stay ~flat per probe
      val ((tidx, vidx), tb) = timed(SearchQueries.hybridBuildIndexes(s, dir))
      val embs = s.createDataFrame(
          SearchQueries.HybridPanelTerms.map { case (pid, t) => (pid, t.mkString(" ")) })
        .toDF("pid", "text")
        .select(col("pid"), graft.functions.TextFunctions.hashEmbed(
          graft.functions.TextFunctions.tokens(col("text")), SearchQueries.EmbDim).as("e"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val panel = SearchQueries.HybridPanelTerms.map { case (pid, t) => (pid, t, embs(pid)) }
      val (depths, tc) = timed(SearchQueries.hybridCalibrateBatch(vidx, panel))
      val (_, tp) = timed(
        SearchQueries.hybridServeIndexedBatch(s, tidx, vidx, panel, depths)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "build_calibrate" -> tc, "probe" -> tp)
    },
    "q_hybrid_batch_df" -> { (s, dir) =>
      // the frame-panel twin: same build/calibrate phases, the probe is
      // the DF route (panel + persisted depths as frame columns)
      val ((tidx, vidx), tb) = timed(SearchQueries.hybridBuildIndexes(s, dir))
      val embs = s.createDataFrame(
          SearchQueries.HybridPanelTerms.map { case (pid, t) => (pid, t.mkString(" ")) })
        .toDF("pid", "text")
        .select(col("pid"), graft.functions.TextFunctions.hashEmbed(
          graft.functions.TextFunctions.tokens(col("text")), SearchQueries.EmbDim).as("e"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val panel = SearchQueries.HybridPanelTerms.map { case (pid, t) => (pid, t, embs(pid)) }
      val (depths, tc) = timed(SearchQueries.hybridCalibrateBatch(vidx, panel))
      val panelDf = s.createDataFrame(panel.map { case (pid, t, qe) =>
          (pid, t, qe.toSeq, depths(pid)) })
        .toDF("probe_id", "terms", "qe", "depth")
      val (_, tp) = timed(
        SearchQueries.hybridServeIndexedBatchDF(s, tidx, vidx, panelDf, useDepth = true)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "build_calibrate" -> tc, "probe" -> tp)
    },
    "q_ann_batch_df" -> { (s, dir) =>
      // the registered query is build-dominated (in-query IVF build +
      // per-probe exact calibration before a 30-row serve); the split
      // lets probeVerdict attribute any compound drift to the phase
      val base = graft.store.Scratch.dir("graft_abdf_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val panel = vectors.filter(col("id").isin(Seq(3L, 17L, 101L, 257L, 350L, 499L): _*))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).toSeq
      val (depths, tc) = timed(idx.exactDepths(panel, k = 5))
      val probesDf = s.createDataFrame(panel.map { case (pid, qe) =>
        (pid, qe.toSeq, depths(pid)) }).toDF("probe_id", "qe", "depth")
      val (_, tp) = timed(
        idx.queryBatchDF(probesDf, k = 5, nprobe = 4, useDepth = true)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "build_calibrate" -> tc, "probe" -> tp)
    },
    "q_phrase" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_phr_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.phraseQuery(SearchQueries.PhraseTerms, SearchQueries.PhraseK)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_near" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_near_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.nearQuery(SearchQueries.NearTerms._1, SearchQueries.NearTerms._2,
          SearchQueries.NearWindow, SearchQueries.NearK)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_boolean" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_bool_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.booleanQuery(SearchQueries.BoolMust, SearchQueries.BoolShould,
          SearchQueries.BoolNot, SearchQueries.BoolK)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_boolean_phrase" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_bp_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.booleanQueryString(
          "\"" + SearchQueries.PhraseTerms.mkString(" ") + "\" vector -slow",
          SearchQueries.BoolK)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_prefix" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_px_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.prefixQuery(SearchQueries.PrefixStr, SearchQueries.PrefixK,
          SearchQueries.PrefixMax)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_snippet" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_sn_split")
      val idx = new TextIndex(s, base, numBuckets = 8)
      val (_, tb) = timed(idx.build(tbl(s, dir, "documents").select("doc_id", "text")))
      val (_, tp) = timed(
        idx.highlight(SearchQueries.QueryTerms, k = 10,
          window = SearchQueries.SnippetWindow)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    // Percolation has no index build — its two cost centers are the corpus
    // parquet scan (small-file-IO-sensitive, the suspected contention
    // victim in the r8 driver run) and the term-join matching. "build"
    // here = materialize the scanned doc frame; "probe" = the match over
    // the cached frame — so a flagged q_percolate can be attributed to IO
    // vs compute like the index queries.
    "q_percolate" -> { (s, dir) =>
      val docs = tbl(s, dir, "documents").select("doc_id", "text").persist()
      val (_, tb) = timed(docs.count())
      val (_, tp) = timed(
        Percolate.matches(docs, SearchQueries.percProfilesDf(s))
          .orderBy("doc_id", "profile_id")
          .write.format("noop").mode("overwrite").save())
      docs.unpersist()
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_envelope_search" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_env_split")
      val master = "envelope-master-0123456789abcdef"
      val master2 = "ENVELOPE-master-0123456789abcdef"
      val rows = tbl(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          concat(lit("doc for vector "), col("vec_id")).as("doc"),
          col("embedding").as("emb"))
      val (_, tb) = timed {
        val enc = Envelope.open(s, base, master)
        enc.storeIndexed(rows, "vectors", numCells = 8)
        Envelope.rotateMaster(base, master, master2)
      }
      val qe = tbl(s, dir, "embeddings").filter(col("vec_id") === 17)
        .head().getAs[Seq[Float]]("embedding").toArray
      val (_, tp) = timed(
        Envelope.open(s, base, master2)
          .queryIndexed("vectors", qe, k = 5, nprobe = 8)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_encrypt_search" -> { (s, dir) =>
      // build = encrypt + train + cell-partitioned land; probe = the
      // pruned decrypt search — the number that must stay ~flat (the
      // r11 verdict's missing split: a drift inside the compound was
      // unattributable between AES-GCM ingest and serving)
      val base = graft.store.Scratch.dir("graft_encq_split")
      val enc = new graft.store.EncryptedStore(s, base, StoreQueries.TestKey)
      val rows = tbl(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          concat(lit("doc for vector "), col("vec_id")).as("doc"),
          col("embedding").as("emb"))
      val (_, tb) = timed(enc.storeIndexed(rows, "vectors", numCells = 8))
      val qe = tbl(s, dir, "embeddings").filter(col("vec_id") === 17)
        .head().getAs[Seq[Float]]("embedding").toArray
      val (_, tp) = timed(
        enc.queryIndexed("vectors", qe, k = 5, nprobe = 8)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_encrypt_batch_df" -> { (s, dir) =>
      // the bench's most expensive query gains attribution (r15): build =
      // encrypted storeIndexed (k-means train + SQ8 stats + AES-GCM
      // cell-partitioned land), probe = the DF-probe batched serving
      // (small panels dispatch to the Seq twins; at full shortlist the
      // raw queryIndexedBatch)
      val base = graft.store.Scratch.dir("graft_encbdf_split")
      val enc = new graft.store.EncryptedStore(s, base, StoreQueries.TestKey)
      val rows = tbl(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          concat(lit("doc for vector "), col("vec_id")).as("doc"),
          col("embedding").as("emb"))
      val (_, tb) = timed(enc.storeIndexed(rows, "vectors", numCells = 8))
      val probesDf = tbl(s, dir, "embeddings")
        .filter(col("vec_id").isin(3L, 17L, 101L, 257L))
        .select(col("vec_id").as("probe_id"), col("embedding").as("qe"))
      val (_, tp) = timed(
        enc.queryIndexedBatchDF("vectors", probesDf, k = 5, nprobe = 8,
            shortlist = 1 << 20)
          .select(col("probe_id"), col("rn"), col("id"), col("doc"),
            round(col("distance"), 6).as("dist"))
          .orderBy("probe_id", "rn")
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_encrypt_graph_df" -> { (s, dir) =>
      // build = kNN-graph train + AES-GCM land; probe = the frame walk
      // with semi-join-bounded decrypts — the new compound lands with a
      // decomposition from its first round, so any future drift is
      // attributable on day one
      val e = tbl(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("id"),
          concat(lit("doc for vector "), col("vec_id")).as("doc"),
          col("embedding").as("emb"))
      val eg = new graft.store.EncryptedGraph(
        s, graft.store.Scratch.dir("graft_encgdf_split"), StoreQueries.TestKey)
      val (_, tb) = timed(eg.build(corpus, k = 4,
        Seq(AnnQueries.lshBucketFn(0), AnnQueries.lshBucketFn(200)),
        refineRounds = 0))
      val panelDf = e.filter(col("vec_id") === 0)
        .select(lit(0L).as("probe_id"), col("embedding").as("qe"))
      val (_, tp) = timed(
        eg.queryBatchDF(panelDf, topK = 5, beamWidth = 4, hops = 3,
            entries = Seq(1L, 2L), includeDoc = true)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ann_exact_pruned" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_exq_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val qe = vectors.filter(col("id") === 0).head().getSeq[Float](1).toArray
      val (_, tp) = timed(
        idx.queryExact(qe, k = 5, probe0 = 4)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ann_range" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_rng_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val qe = vectors.filter(col("id") === 0).head().getSeq[Float](1).toArray
      val (_, tp) = timed(
        idx.rangeSearch(qe, radius = AnalyticsQueries.RangeRadius)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ann_self_join" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_sj_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val (_, tp) = timed(
        idx.selfJoinWithin(AnalyticsQueries.RangeRadius, where = Some(col("id") % 8 === 0))
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "join" -> tp)
    },
    "q_ann_range_join" -> { (s, dir) =>
      val base = graft.store.Scratch.dir("graft_rj_split")
      val idx = new IvfIndex(s, base, numCells = 16)
      val vectors = tbl(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val (_, tb) = timed(idx.build(vectors))
      val probes = tbl(s, dir, "embeddings")
        .filter(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val (_, tp) = timed(
        idx.rangeJoin(probes, AnalyticsQueries.RangeRadius)
          .write.format("noop").mode("overwrite").save())
      Seq("build" -> tb, "join" -> tp)
    },
    // The r12 verdict's unclearable flag: q_maxsim_rerank measured 10.8x
    // on a contended box but had no registered decomposition, so the guard
    // could not localize the drift. `build` = stage-1 candidate generation
    // (the corpus-scale tokenize+embed+cosine+top-50 pass a production
    // system precomputes as an index); `probe` = the MaxSim rerank over
    // the 50 candidates — shortlist-bounded, the number that must stay
    // flat at any corpus size. Persist+count is the timing fence.
    "q_maxsim_rerank" -> { (s, dir) =>
      val (cand, tb) = timed {
        val c = SearchQueries.maxsimCandidates(s, dir).persist()
        c.count()
        c
      }
      val (_, tp) = timed(
        SearchQueries.maxsimRerank(cand)
          .write.format("noop").mode("overwrite").save())
      cand.unpersist()
      Seq("build" -> tb, "probe" -> tp)
    },
    "q_ann_graph_search" -> { (s, dir) =>
      val e = tbl(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("id"), col("embedding").as("emb")).persist()
      val qe: Array[Float] = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val (graph, tb) = timed {
        val g = KnnGraph.build(corpus,
          Seq(AnnQueries.lshBucketFn(0), AnnQueries.lshBucketFn(200)), k = 4)
          .persist()
        g.count() // force the build before the probe clock starts
        g
      }
      val (_, tp) = timed(
        KnnGraph.beamSearch(graph, corpus, qe,
          k = 5, beamWidth = 4, hops = 3, entries = Seq(1L, 2L)))
      graph.unpersist()
      corpus.unpersist()
      Seq("build" -> tb, "probe" -> tp)
    })
}
