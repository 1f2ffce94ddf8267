package graft.tools

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.KnnGraph
import graft.queries.AnnQueries
import graft.store.{GraphIndex, IvfIndex}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** THE dev profiler (not driver contract) — every measurement family behind
  * one parameterized main (SURVEY §8.3 numbers regenerate from here).
  *
  * Usage: runMain graft.tools.Prof <family> [args]
  *   queries [sfDir] [name ...]  time registry queries (all when unnamed)
  *   shingle [sfDir]             shingle-set materialization bisect
  *   scale   [stressDir]         trained-IVF build/probe + kNN-graph build
  *                               + beam serve at a /tmp/scaleN fixture
  *   serve   [stressDir]         persistent GraphIndex: build once, then
  *                               cold/warm beam serving, batched serving,
  *                               and fixed-size insert cost — the rows that
  *                               prove serving and insert are bounded by
  *                               walk/batch size, not corpus size
  *   mine    [stressDir]         hard-negative mining at calibrated bucket
  *                               width, weighted sampling, and TextIndex
  *                               build + bucket-pruned query
  *
  * Stress fixtures come from scripts/gen_scale_stress.py
  * (STRESS_COPIES=20|100 -> /tmp/scale20|/tmp/scale100). */
object Prof {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](tag: String, extra: String = "")(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s $extra")
    r
  }

  /** Sign-LSH bucketing from plane family `off`; the bucket COUNT must grow
    * with the corpus (KnnGraph.build's calibration note): fixed 6-bit
    * buckets go quadratic at 20x. */
  private def bucketFn(off: Int, bits: Int): Column => Column =
    emb => (0 until bits).map { p =>
      when(VF.dot(emb, typedlit(AnnQueries.plane(off + p))) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def scaledBits(n: Long): Int =
    math.max(6, (math.log(n.toDouble / 10.0) / math.log(2.0)).ceil.toInt)

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("queries") => queries(args.drop(1))
    case Some("shingle") => shingle(args.drop(1))
    case Some("scale") => scale(args.drop(1))
    case Some("serve") => serve(args.drop(1))
    case Some("sq8serve") => sq8serve(args.drop(1))
    case Some("dim384") => dim384(args.drop(1))
    case Some("mine") => mine(args.drop(1))
    case Some("delstress") => delstress(args.drop(1))
    case Some("bpe") => bpe(args.drop(1))
    case Some("qualitytrain") => qualitytrain(args.drop(1))
    case Some("encserve") => encserve(args.drop(1))
    case Some("retrain") => retrainStress(args.drop(1))
    case Some("routedlabel") => routedlabel(args.drop(1))
    case Some("phrase") => phrase(args.drop(1))
    case Some("pqserve") => pqserve(args.drop(1))
    case Some("exactserve") => exactserve(args.drop(1))
    case Some("encexact") => encexact(args.drop(1))
    case Some("textserve") => textserve(args.drop(1))
    case Some("r9") => r9(args.drop(1))
    case Some("r10") => r10(args.drop(1))
    case Some("r11") => r11(args.drop(1))
    case Some("r12") => r12(args.drop(1))
    case Some("r13") => r13(args.drop(1))
    case Some("trainday") => trainday(args.drop(1))
    case Some("onnx") => onnx(args.drop(1))
    case Some("graphpq") => graphpq(args.drop(1))
    case Some("semperc") => semperc(args.drop(1))
    case Some("paneldf") => paneldf(args.drop(1))
    case other =>
      sys.error(s"unknown family $other — use queries|shingle|scale|serve|sq8serve|dim384|mine|delstress|bpe|qualitytrain|encserve|retrain|routedlabel|phrase|pqserve|exactserve|encexact|textserve|r9|r10|onnx|graphpq|semperc|paneldf")
  }

  /** DF-probe batched serving at corpus-FRACTION panels
    * ([[graft.store.IvfIndex.queryBatchDF]] — the embedding-join shape
    * when the probe side is a FRAME the driver never collects). Pass
    * criteria across /tmp/scale20 vs /tmp/scale100: the DF route tracks
    * the Seq route where both exist (≤ 4096 probes), keeps scaling past
    * the driver-panel ceiling (16384), and per-probe cost stays ~flat as
    * the corpus grows (cells scale with the corpus, so nprobe=4 probes a
    * shrinking corpus fraction). */
  private def paneldf(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cells = math.max(16, (n / 2048L).toInt)
    val idx = new IvfIndex(s, graft.store.Scratch.dir("scale_paneldf_ivf"), cells)
    time(s"paneldf_build_${cells}cells", nTag)(idx.build(vectors))
    val k = 10
    val np = 4
    for (p <- Seq(1024, 4096, 16384)) {
      // the probe FRAME: a deterministic corpus fraction, frozen so the
      // reps measure serving, not re-sampling; NEVER collected
      val probesDf = vectors.orderBy(xxhash64(col("id")), col("id")).limit(p)
        .select((col("id") + 1000000L).as("probe_id"), col("emb").as("qe"))
        .localCheckpoint()
      def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
        time(s"paneldf_${tag}_$p", nTag)(
          f.write.format("noop").mode("overwrite").save())
      run("df_cold")(idx.queryBatchDF(probesDf, k, np))
      run("df_warm")(idx.queryBatchDF(probesDf, k, np))
      if (p == 16384) {
        // the above-broadcast-limit shape: force the salted equi-join
        // (corpus side salted, routing frame replicated across the salt
        // space) — the route a million-probe frame would take
        s.conf.set(graft.operators.ProbeJoin.LimitKey, "1024")
        try run("df_salted")(idx.queryBatchDF(probesDf, k, np))
        finally s.conf.unset(graft.operators.ProbeJoin.LimitKey)
      }
      if (p <= 4096) {
        // the Seq route's ceiling: the whole panel as driver arrays
        val panel = probesDf.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        run("seq_warm")(idx.queryBatch(panel, k, np))
      }
    }
    // the in-frame depth policy: exactDepths at its panel cap, routed
    // through the frame's depth column instead of a driver map
    val panel1024 = vectors.orderBy(xxhash64(col("id")), col("id")).limit(1024)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getSeq[Float](1).toArray)).toSeq
    val depths = time("paneldf_depths_1024", nTag)(idx.exactDepths(panel1024, k))
    val probesDepthDf = s.createDataFrame(panel1024.map { case (pid, qe) =>
      (pid, qe.toSeq, depths(pid)) }).toDF("probe_id", "qe", "depth")
    time("paneldf_df_depths_1024", nTag)(
      idx.queryBatchDF(probesDepthDf, k, cells, useDepth = true)
        .write.format("noop").mode("overwrite").save())
    s.stop()
  }

  /** Round-9 surfaces at scale: recall calibration (cost ≈ one panel
    * scan), GraphIndex SQ8 hot serving (budget pinned inside the
    * codes-fit window), chunk→doc RAG retrieval, and the in-place
    * positional upgrade (cost tracks the OLD generations, not the
    * corpus — measured at two pre-gen fractions over one fixed corpus). */
  /** Semantic percolation at scale (the q_percolate_semantic matcher):
    * one chunk+embed corpus pass × broadcast registry, θ filtered before
    * the (profile, doc) aggregation. Pass criteria across /tmp/scale20
    * vs /tmp/scale100: time tracks the corpus ~linearly (the chunk scan)
    * with alert volume riding along — never doc×profile. */
  private def semperc(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val sq = graft.queries.SearchQueries
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    val nTag = s"(docs=$nd)"
    val profiles = sq.semPercProfilesDf(s)
    def once(): Long = graft.operators.Percolate.semanticMatches(
      docs, profiles, sq.RagWindow, sq.RagStride, sq.EmbDim).count()
    time("semperc_cold", nTag)(println(s"PROF semperc_alerts n=${once()} $nTag"))
    (1 to 2).foreach(i => time(s"semperc_warm$i", nTag)(once(): Unit))
    s.stop()
  }

  /** GraphIndex PQ serving at scale: build with `codes = "pq"`, pin the
    * hot budget INSIDE the PQ-codes-fit window (above the PQ estimate,
    * below the SQ8 estimate — the budget at which ONLY the PQ tier
    * admits), and measure cold/warm hot serving plus the cold Spark
    * walk. Pass criteria across /tmp/scale20 vs /tmp/scale100: warm PQ
    * hot serving ~flat (walk-bounded, corpus-invariant), admission math
    * 8x under the SQ8 tier's. */
  private def graphpq(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val vectors = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = vectors.count()
    val nTag = s"(n=$n)"
    val bits = scaledBits(n)
    val gbase = graft.store.Scratch.dir("scale_r10_gpq")
    val pqM = 8
    val gidx = new GraphIndex(s, gbase, k = 8,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
    time("r10_graphpq_build", nTag)(gidx.build(vectors, codes = "pq", pqM = pqM))
    val qe = vectors.filter(col("id") === 17).head().getSeq[Float](1).toArray
    val nEdges = gidx.graph.count()
    val estPq = n * (pqM + 48L) + nEdges * 8L
    val estSq8 = n * (qe.length + 48L) + nEdges * 8L
    println(s"PROF r10_graphpq_window pq_est=$estPq sq8_est=$estSq8 $nTag")
    val prev = System.getProperty("graft.hot.maxBytes")
    System.setProperty("graft.hot.maxBytes", estPq.toString)
    try {
      require(gidx.hotQueryQuantized(qe, 5, 8, 4, rerank = 64).isEmpty,
        "inside the window the SQ8 tier must refuse")
      time("r10_graphpq_hot_cold", nTag)(
        require(gidx.hotQueryPq(qe, 5, 8, 4, rerank = 64).isDefined))
      (1 to 2).foreach { i =>
        time(s"r10_graphpq_hot_warm$i", nTag)(
          gidx.hotQueryPq(qe, 5, 8, 4, rerank = 64): Unit)
      }
    } finally {
      if (prev == null) System.clearProperty("graft.hot.maxBytes")
      else System.setProperty("graft.hot.maxBytes", prev)
    }
    time("r10_graphpq_coldq", nTag)(
      gidx.queryPq(qe, 5, 8, 4, rerank = 64).collect(): Unit)
    s.stop()
  }

  /** Transformer-embed throughput envelope (r9 verdict stretch): batched
    * [[graft.functions.OnnxTransformerEmbedder]] encode throughput on the
    * hermetic mini-BERT (TinyBert — one real transformer block, h=8) over
    * a corpus-derived WordPiece vocab, at three batch sizes on a fixed
    * 20k-doc slice plus one full-corpus row. The number that decides the
    * 100 TB ingest design: executor-side transformer inference per doc vs
    * one-time pre-computed embeddings (a real MiniLM at h=384/6 layers
    * costs ~3 orders more FLOPs per token than this block — scale the
    * measured docs/s down by (384/8)²·6 for the deployment estimate). */
  private def onnx(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    val nTag = s"(docs=$nd)"
    // corpus-frequent WordPiece vocab (whole words; misses UNK) — the
    // tokenizer exercises real greedy matching over real text
    val top = docs.select(explode(TF.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(desc("count"), asc("t")).limit(1000)
      .collect().map(_.getString(0))
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ top
    val vp = java.nio.file.Files.createTempFile("graft_onnx_vocab", ".txt")
    java.nio.file.Files.write(vp, vocab.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val w = graft.functions.TinyBert.weights(
      vocabN = vocab.length, maxLen = 64, h = 8, heads = 2, seed = 11)
    val mp = java.nio.file.Files.createTempFile("graft_onnx_bert", ".onnx")
    java.nio.file.Files.write(mp, graft.functions.TinyBert.model(w))
    val sliceN = math.min(20000L, nd)
    val slice = docs.orderBy("doc_id").limit(sliceN.toInt).persist()
    slice.count(): Unit
    for (bs <- Seq(8, 32, 128)) {
      val emb = graft.functions.OnnxTransformerEmbedder(
        mp.toString, vp.toString, dim = 8, maxLen = 64, batchSize = bs)
      val t0 = System.nanoTime()
      emb.embed(slice, "text", "e")
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF onnx_embed_bs$bs%-18s $sec%8.2f s " +
        f"(${sliceN / sec}%.0f docs/s over $sliceN docs, 32 threads)")
    }
    slice.unpersist(): Unit
    // the full-corpus scaling row at the middle batch size
    val emb = graft.functions.OnnxTransformerEmbedder(
      mp.toString, vp.toString, dim = 8, maxLen = 64, batchSize = 32)
    val t0 = System.nanoTime()
    emb.embed(docs, "text", "e")
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROF onnx_embed_corpus    $sec%8.2f s (${nd / sec}%.0f docs/s) $nTag")
    s.stop()
  }

  /** Round-10 stress rows: index-routed RAG serving (q_rag_indexed's
    * pipeline) — the claim under test is that WARM ROUTED retrieval is
    * ~flat across 20x/100x (probed-cell bytes, never the corpus) while
    * the exact arm (r9_rag_*) grows linearly with chunk volume. Build
    * and calibration are attach-time, reported separately. */
  /** r11: training-pipeline PROBE PANELS (256 / 1024 probes) — the
    * evidence behind the queryBatch answer-shuffle rewrite. For each
    * panel size: the exchange volumes of the two formulations (the
    * retained window oracle ships the FULL cell-pruned candidate set;
    * the GroupedTopK tail ships ≤ k × probes × tasks answers), cold/warm
    * wall time of both, per-probe exactDepths at panel scale, and the
    * graph twin's per-probe-beam batched serving at a 256 panel. */
  /** Round-12 surfaces at scale: (1) the encrypted DF-probe route
    * (`EncryptedStore.queryIndexedBatchDF` — panel as a frame, decrypt
    * bounded to routed-cell codes + shortlist-survivor embeddings) vs the
    * Seq batch at its driver-panel ceiling, with the Seq windowed twin as
    * the exchange baseline; (2) the graph frontier-as-frames walk
    * (`GraphIndex.queryBatchDF`) at 256/1024-probe panels vs the
    * driver-HashMap walk — the driver-state ceiling the frame walk
    * removes; (3) batched hybrid serving at a 256-probe standing panel vs
    * the per-probe loop. */
  private def r12(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    // optional section selector (enc|graph|hyb) so each family fits a
    // bounded wall-clock window at 100x
    val section = args.drop(1).headOption.getOrElse("all")
    def want(tag: String) = section == "all" || section == tag
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---------------- encrypted DF-probe serving (verdict #2)
    if (want("enc")) {
    val cells = math.max(16, (n / 2048L).toInt)
    val es = new graft.store.EncryptedStore(s,
      graft.store.Scratch.dir("scale_r12_enc"), "0123456789abcdef")
    val rows = vectors.select(col("id").cast("string").as("id"),
      concat(lit("doc "), col("id")).as("doc"), col("emb"))
    time(s"r12_enc_build_${cells}cells", nTag)(es.storeIndexed(rows, "c", numCells = cells))
    val pool = vectors.orderBy(xxhash64(col("id")), col("id")).limit(4096)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getSeq[Float](1).toArray)).toSeq
    val k = 10
    val np = 4
    val p256 = pool.take(256)
    // exchange volume + EXPOSURE: the windowed twin ranks (and therefore
    // shuffles) every cell-pruned candidate WITH ITS DECRYPTED EMBEDDING;
    // k=MaxValue keeps them all, so this count IS the row volume crossing
    // that exchange, and candidates × dim × 4B is the plaintext embedding
    // bytes written to shuffle files. The serving tail ships k × P answer
    // rows whose payload is still ciphertext — plaintext-through-shuffle
    // is ZERO by construction.
    val cand = es.queryIndexedBatchWindowed("c", p256, Int.MaxValue, np).count()
    // dim measured from the data, not assumed — a non-64-dim corpus must
    // not silently misreport the exposure bytes
    val embDim = e.select(size(col("embedding"))).head().getInt(0)
    println(s"PROF r12_enc_exchange_256 candidates=$cand answers=${k.toLong * 256} " +
      s"ratio=${cand / (k.toLong * 256)}x plaintext_emb_bytes=${cand * embDim.toLong * 4L} $nTag")
    time("r12_enc_seq_agg_256", nTag)(noop(es.queryIndexedBatch("c", p256, k, np)))
    time("r12_enc_seq_win_256", nTag)(noop(es.queryIndexedBatchWindowed("c", p256, k, np)))
    for (p <- Seq(1024, 4096)) {
      val probesDf = s.createDataFrame(
        pool.take(p).map { case (pid, qe) => (pid, qe.toSeq) })
        .toDF("probe_id", "qe").localCheckpoint()
      time(s"r12_enc_df_cold_$p", nTag)(
        noop(es.queryIndexedBatchDF("c", probesDf, k, np, shortlist = 64)))
      time(s"r12_enc_df_warm_$p", nTag)(
        noop(es.queryIndexedBatchDF("c", probesDf, k, np, shortlist = 64)))
    }
    // decrypt volume, stated: phase 1 decrypts the compact codes_ct of
    // the routed cells only — each probe needs np/cells of the corpus,
    // union-bounded by n rows ONCE (never once per probe) — and phase 2
    // the full emb_ct of the DISTINCT shortlist survivors only
    println(f"PROF r12_enc_decrypt codes_rows<=$n%d once " +
      f"(${100.0 * np / cells}%.1f%%/probe, union-bounded) " +
      s"emb_rows<=${math.min(n, 64L * 4096)} distinct survivors $nTag")

    }
    // ---------------- graph frontier-as-frames walk (verdict #4)
    if (want("graph")) {
    val gvectors = vectors.select(col("id"),
      expr("transform(emb, (x, i) -> CASE WHEN i = CAST(id % 64 AS INT) " +
        "THEN x + CAST(id % 997 AS FLOAT) * CAST(1e-4 AS FLOAT) " +
        "ELSE x END)").as("emb"))
    val gpool = gvectors.orderBy(xxhash64(col("id")), col("id")).limit(1024)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getSeq[Float](1).toArray)).toSeq
    val bits = scaledBits(n)
    val gidx = new GraphIndex(s, graft.store.Scratch.dir("scale_r12_g"), k = 8,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
    time("r12_graph_build", nTag)(gidx.build(gvectors))
    for (p <- Seq(256, 1024)) {
      val panel = gpool.take(p)
      time(s"r12_graph_driver_$p", nTag)(
        noop(gidx.queryBatch(panel, 5, beamWidth = 4, hops = 6)))
      val probesDf = s.createDataFrame(
        panel.map { case (pid, qe) => (pid, qe.toSeq) })
        .toDF("probe_id", "qe").localCheckpoint()
      time(s"r12_graph_df_cold_$p", nTag)(
        noop(gidx.queryBatchDF(probesDf, 5, beamWidth = 4, hops = 6)))
      time(s"r12_graph_df_warm_$p", nTag)(
        noop(gidx.queryBatchDF(probesDf, 5, beamWidth = 4, hops = 6)))
    }

    }
    // ---------------- the graph-walk crossover (frame walk's raison
    // d'être): at training-panel sizes the driver walk's O(panel ×
    // visited) state and per-hop collects stop being free
    if (want("graphbig")) {
    val gvectors = vectors.select(col("id"),
      expr("transform(emb, (x, i) -> CASE WHEN i = CAST(id % 64 AS INT) " +
        "THEN x + CAST(id % 997 AS FLOAT) * CAST(1e-4 AS FLOAT) " +
        "ELSE x END)").as("emb"))
    val bits = scaledBits(n)
    val gidx = new GraphIndex(s, graft.store.Scratch.dir("scale_r12_gb"), k = 8,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
    time("r12_graphbig_build", nTag)(gidx.build(gvectors))
    // the probe FRAME never collects; the driver walk REQUIRES the panel
    // as driver arrays — that asymmetry is the measurement
    val bigFrame = gvectors
      .orderBy(xxhash64(col("id")), col("id")).limit(16384)
      .select((col("id") + 1000000L).as("probe_id"), col("emb").as("qe"))
      .localCheckpoint()
    for (p <- Seq(4096, 16384)) {
      val probesDf = bigFrame.orderBy("probe_id").limit(p).localCheckpoint()
      time(s"r12_graphbig_df_$p", nTag)(
        noop(gidx.queryBatchDF(probesDf, 5, beamWidth = 4, hops = 6)))
      val panel = probesDf.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      time(s"r12_graphbig_driver_$p", nTag)(
        noop(gidx.queryBatch(panel, 5, beamWidth = 4, hops = 6)))
    }
    }
    // ---------------- batched hybrid serving (verdict #5)
    if (want("hyb")) {
    val sq = graft.queries.SearchQueries
    val ndocs = s.read.parquet(s"$dir/documents.parquet").count()
    val hTag = s"(docs=$ndocs)"
    val (tidx, vidx) = {
      val t0 = System.nanoTime()
      val r = sq.hybridBuildIndexes(s, dir)
      println(f"PROF r12_hyb_build              ${(System.nanoTime() - t0) / 1e9}%8.2f s $hTag")
      r
    }
    // 256 standing hybrid queries over the corpus' own frequent terms —
    // deterministic term picks, embedding = the terms' hash embedding
    val vocab = s.read.parquet(s"$dir/documents.parquet")
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().orderBy(desc("count"), asc("tok"))
      .limit(64).collect().map(_.getString(0)).toSeq
    val v = vocab.length // synthetic stress text has a small vocabulary
    val termSeqs = (0 until 256).map { i =>
      (i.toLong + 1L, Seq(vocab(i % v), vocab((i * 7 + 1) % v),
        vocab((i * 13 + 2) % v), vocab((i * 29 + 3) % v)).distinct)
    }
    // all 256 probe embeddings in ONE job (a per-probe embOf loop is 256
    // driver-side jobs — panel construction would dwarf the measurement)
    val embMap = s.createDataFrame(
        termSeqs.map { case (pid, terms) => (pid, terms.mkString(" ")) })
      .toDF("pid", "text")
      .select(col("pid"), TF.hashEmbed(TF.tokens(col("text")), sq.EmbDim).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val hpanel = termSeqs.map { case (pid, terms) => (pid, terms, embMap(pid)) }
    val hdepths = time("r12_hyb_calibrate_256", hTag)(
      sq.hybridCalibrateBatch(vidx, hpanel))
    time("r12_hyb_batch_cold_256", hTag)(
      noop(sq.hybridServeIndexedBatch(s, tidx, vidx, hpanel, hdepths)))
    time("r12_hyb_batch_warm_256", hTag)(
      noop(sq.hybridServeIndexedBatch(s, tidx, vidx, hpanel, hdepths)))
    // the per-probe loop at 16 probes — the ceiling the batch removes
    // (extrapolate ×16 for the 256-panel loop cost)
    val loop16 = hpanel.take(16)
    time("r12_hyb_loop_16", hTag)(
      loop16.foreach { case (pid, terms, qe) =>
        noop(sq.hybridServeIndexed(s, tidx, vidx, qe,
          Map(0L -> hdepths(pid)), terms))
      })
    }
    s.stop()
  }

  /** The r13 surfaces at stress scale — sections:
    *   hybdf — the MaxScore-bounded batched kw arm vs the unbounded pass
    *           (the r12 §8.3 worst case: 31-token vocabulary, every
    *           standing term common), and the DF-probe hybrid route at
    *           256/1024/4096 standing panels vs the Seq route;
    *   gwalk — the segment-checkpoint frame walk vs the driver walk at
    *           1024/4096/16384 probes (crossover re-measure);
    *   encg  — EncryptedGraph build + batched serving with the decrypt
    *           volume stated (fresh-frontier rows, never the corpus). */
  private def r13(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val section = args.drop(1).headOption.getOrElse("all")
    def want(tag: String) = section == "all" || section == tag
    val s = session(32)
    val sq = graft.queries.SearchQueries
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (want("hybdf") || section == "kw") {
      val ndocs = s.read.parquet(s"$dir/documents.parquet").count()
      val hTag = s"(docs=$ndocs)"
      val (tidx, vidx) = time("r13_hyb_build", hTag)(sq.hybridBuildIndexes(s, dir))
      val vocab = s.read.parquet(s"$dir/documents.parquet")
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy("tok").count().orderBy(desc("count"), asc("tok"))
        .limit(64).collect().map(_.getString(0)).toSeq
      val v = vocab.length
      def termSeqs(p: Int) = (0 until p).map { i =>
        (i.toLong + 1L, Seq(vocab(i % v), vocab((i * 7 + 1) % v),
          vocab((i * 13 + 2) % v), vocab((i * 29 + 3) % v)).distinct)
      }
      // the kw arm ALONE, 256 standing panels over the worst-case common
      // vocabulary: the unbounded union pass vs the ADAPTIVE bounded one
      // (uniform vocab → the bound cannot shrink the fanout → the
      // adaptive route must track the unbounded pass + the cost of asking)
      val ts256 = termSeqs(256)
      time("r13_kw_unbounded_256", hTag)(
        noop(tidx.queryRankedBatch(ts256, sq.ShortlistK)))
      time("r13_kw_bounded_256", hTag)(
        noop(tidx.queryRankedBatchBounded(ts256, sq.ShortlistK)))
      // the SKEWED panel — each probe carries the corpus' one rare term
      // ('dup', ~35× rarer) beside three common ones: θ from the rare
      // term's docs makes the commons nonessential, the bound ENGAGES,
      // and the fanout collapses to the rare df
      val rare = s.read.parquet(s"$dir/documents.parquet")
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy("tok").count().orderBy(asc("count"), asc("tok"))
        .limit(1).collect().head.getString(0)
      val tsSkew = (0 until 256).map { i =>
        (i.toLong + 1L, Seq(rare, vocab(i % v), vocab((i * 7 + 1) % v),
          vocab((i * 13 + 2) % v)).distinct)
      }
      time("r13_kw_unbounded_skew_256", hTag)(
        noop(tidx.queryRankedBatch(tsSkew, sq.ShortlistK)))
      time("r13_kw_bounded_skew_256", hTag)(
        noop(tidx.queryRankedBatchBounded(tsSkew, sq.ShortlistK)))
      if (section == "kw") { s.stop(); return }
      // panels as FRAMES: the DF hybrid route at growing standing fleets
      // (uniform depth 4 on both routes so serving cost, not per-probe
      // calibration, is the measured number)
      def embsOf(ts: Seq[(Long, Seq[String])]): Map[Long, Array[Float]] =
        s.createDataFrame(ts.map { case (pid, t) => (pid, t.mkString(" ")) })
          .toDF("pid", "text")
          .select(col("pid"), TF.hashEmbed(TF.tokens(col("text")), sq.EmbDim).as("e"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val seq256 = {
        val em = embsOf(ts256)
        ts256.map { case (pid, t) => (pid, t, em(pid)) }
      }
      val d256 = ts256.map { case (pid, _) => pid -> 4 }.toMap
      time("r13_hyb_seq_256", hTag)(
        noop(sq.hybridServeIndexedBatch(s, tidx, vidx, seq256, d256)))
      for (p <- Seq(256, 1024, 4096)) {
        val ts = termSeqs(p)
        val em = embsOf(ts)
        val panelDf = s.createDataFrame(ts.map { case (pid, t) =>
            (pid, t, em(pid).toSeq, 4) })
          .toDF("probe_id", "terms", "qe", "depth").localCheckpoint()
        time(s"r13_hyb_df_cold_$p", hTag)(
          noop(sq.hybridServeIndexedBatchDF(s, tidx, vidx, panelDf, useDepth = true)))
        // the 4096-probe warm repeat is skipped: at 100× the cold number
        // alone is a ~20 min measurement and the smaller panels already
        // carry the warm-vs-cold signal
        if (p <= 1024) time(s"r13_hyb_df_warm_$p", hTag)(
          noop(sq.hybridServeIndexedBatchDF(s, tidx, vidx, panelDf, useDepth = true)))
      }
    }

    if (want("gwalk")) {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count()
      val nTag = s"(n=$n)"
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
      val gvectors = vectors.select(col("id"),
        expr("transform(emb, (x, i) -> CASE WHEN i = CAST(id % 64 AS INT) " +
          "THEN x + CAST(id % 997 AS FLOAT) * CAST(1e-4 AS FLOAT) " +
          "ELSE x END)").as("emb"))
      val bits = scaledBits(n)
      val gidx = new GraphIndex(s, graft.store.Scratch.dir("scale_r13_gw"), k = 8,
        Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
      time("r13_gwalk_build", nTag)(gidx.build(gvectors))
      val bigFrame = gvectors
        .orderBy(xxhash64(col("id")), col("id")).limit(16384)
        .select((col("id") + 1000000L).as("probe_id"), col("emb").as("qe"))
        .localCheckpoint()
      for (p <- Seq(1024, 4096, 16384)) {
        val probesDf = bigFrame.orderBy("probe_id").limit(p).localCheckpoint()
        time(s"r13_gwalk_df_$p", nTag)(
          noop(gidx.queryBatchDF(probesDf, 5, beamWidth = 4, hops = 6)))
        val panel = probesDf.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        time(s"r13_gwalk_driver_$p", nTag)(
          noop(gidx.queryBatch(panel, 5, beamWidth = 4, hops = 6)))
      }
    }

    if (want("encg")) {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count()
      val nTag = s"(n=$n)"
      val corpus = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("id"),
          concat(lit("doc "), col("vec_id")).as("doc"),
          col("embedding").as("emb"))
      val bits = scaledBits(n)
      val eg = new graft.store.EncryptedGraph(s,
        graft.store.Scratch.dir("scale_r13_encg"), "0123456789abcdef")
      time("r13_encg_build", nTag)(
        eg.build(corpus, k = 8, Seq(bucketFn(0, bits), bucketFn(200, bits)),
          numEntries = 8))
      val pool = e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(1024)
        .collect().map(r => (r.getLong(0) + 1000000L,
          r.getSeq[Float](1).toArray)).toSeq
      for (p <- Seq(256, 1024)) {
        time(s"r13_encg_serve_$p", nTag)(
          noop(eg.queryBatch(pool.take(p), 5, beamWidth = 4, hops = 6)))
      }
      // decrypt volume, stated: the walk decrypts each hop's DISTINCT
      // fresh ids once per scoring job — bounded by the visited set, a
      // corpus-invariant function of hops × beam × degree, never n.
      // topK = MaxValue returns the whole visited set: its (probe, id)
      // pair count and distinct-id count ARE the exposure numbers.
      val visited = eg.queryBatch(pool.take(256), Int.MaxValue,
        beamWidth = 4, hops = 6)
      val pairs = visited.count()
      val ids = visited.select("id").distinct().count()
      println(s"PROF r13_encg_decrypt_256 visited_pairs=$pairs " +
        s"distinct_ids_decrypted<=$ids corpus=$n " +
        f"(${100.0 * ids / n}%.2f%% of the corpus ever decrypts) $nTag")
    }
    s.stop()
  }

  /** The composed "training-data day" ([[graft.streaming.TrainingDay]])
    * at stress scale — per-stage wall clock for the streamed curation
    * gate, the capped index build, the per-wave maintenance (chunk+embed+
    * append + policy write-through), the close-of-day near-dup band gate
    * + chunk tombstones + recalibration, and one policy-routed serve.
    * Pass criteria 20× vs 100×: every stage ≤ ~linear in its own input
    * (the gate and maintenance in the WAVE, the band gate in the corpus),
    * and the serve stays ~flat (cell-pruned at per-probe depths). */
  private def trainday(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val n = docs.count()
    val nTag = s"(docs=$n)"
    val sq = graft.queries.SearchQueries
    // benchmark grams: every ~997th doc's 8-grams (an eval-suite-sized
    // contamination set); three ingest waves by doc_id mod 3
    val benchGrams = docs.filter(col("doc_id") % 997 === 0)
      .select(explode(TF.shingleHashSet(TF.tokens(col("text")), 8)).as("g"))
      .distinct().collect().map(_.getLong(0))
    val waves = Seq(0, 1, 2).map(m => docs.filter(col("doc_id") % 3 === m))
    val probes = sq.ragProbePanel(s)
    val kk = sq.RagChunkK + sq.RagCosMargin
    val cells = math.min(512L, math.max(16L, n / 2560L)).toInt
    val (idx, gidx, _, report) = graft.streaming.TrainingDay.run(s, waves,
      benchGrams, minQuality = 0.50, lateness = "10 minutes",
      standingProbes = probes, standingK = kk,
      numCells = cells, window = sq.RagWindow, stride = sq.RagStride,
      dim = sq.EmbDim)
    report.timings.foreach { case (tag, sec) =>
      println(f"PROF trainday_$tag%-24s $sec%8.2f s $nTag")
    }
    println(s"PROF trainday_counts arrived=${report.arrived.mkString(",")} " +
      s"accepted=${report.accepted.mkString(",")} " +
      s"dropped=${report.nearDupDropped} chunks=${report.liveChunks} $nTag")
    time("trainday_serve", nTag)(
      sq.ragServePersisted(s, idx)
        .write.format("noop").mode("overwrite").save())
    // the graph arm's policy-routed serve (r13): the walk's own wall
    // clock at the day's standing panel — must stay ~flat like the IVF
    // serve (beam-bounded point reads, never corpus scans)
    time("trainday_graph_serve", nTag)(
      gidx.queryBatch(probes, 5, beamWidth = 1, hops = 6,
          beamOf = gidx.beamPolicy(probes, 5, Seq(2, 4, 8, 16, 32, 64)))
        .write.format("noop").mode("overwrite").save())
    s.stop()
  }

  private def r11(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cells = math.max(16, (n / 2048L).toInt)
    val idx = new IvfIndex(s, graft.store.Scratch.dir("scale_r11_ivf"), cells)
    time(s"r11_build_${cells}cells", nTag)(idx.build(vectors))
    val pool = vectors.orderBy(xxhash64(col("id")), col("id")).limit(1024)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getSeq[Float](1).toArray)).toSeq
    val k = 10
    val np = 4
    for (p <- Seq(256, 1024)) {
      val panel = pool.take(p)
      // exchange volumes: the window formulation ranks (and therefore
      // shuffles) every cell-pruned candidate; k=MaxValue keeps them all,
      // so this count IS the candidate volume crossing that exchange
      val cand = idx.queryBatchWindowed(panel, Int.MaxValue, np).count()
      println(s"PROF r11_exchange_$p candidates=$cand answers=${k.toLong * p} " +
        s"ratio=${cand / (k.toLong * p)}x $nTag")
      def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
        time(s"r11_${tag}_$p", nTag)(
          f.write.format("noop").mode("overwrite").save())
      run("qb_window_cold")(idx.queryBatchWindowed(panel, k, np))
      run("qb_window_warm")(idx.queryBatchWindowed(panel, k, np))
      run("qb_agg_cold")(idx.queryBatch(panel, k, np))
      run("qb_agg_warm")(idx.queryBatch(panel, k, np))
    }
    // per-probe exact depths AT PANEL SCALE (the q_rag_indexed policy on
    // a training-size panel), then serving at the map
    val panel256 = pool.take(256)
    val depths = time("r11_depths_256", nTag)(idx.exactDepths(panel256, k))
    println(s"PROF r11_depths_hist ${depths.values.groupBy(identity)
      .map { case (d, v) => s"$d:${v.size}" }.toSeq.sorted.mkString(",")} " +
      s"of $cells cells $nTag")
    time("r11_qb_agg_depths_256", nTag)(
      idx.queryBatch(panel256, k, cells, depthOf = depths)
        .write.format("noop").mode("overwrite").save())
    // indexed hybrid: both persisted arms built once, then the fused
    // serve — the number that must stay ~flat (the kw probe prunes to
    // its terms' buckets, the sem probe to its calibrated cells) while
    // the exact q_hybrid_rrf arm re-scans the corpus per execution
    val sq = graft.queries.SearchQueries
    val ndocs = s.read.parquet(s"$dir/documents.parquet").count()
    val hTag = s"(docs=$ndocs)"
    val ((tidx, vidx), _) = {
      val t0 = System.nanoTime()
      val r = sq.hybridBuildIndexes(s, dir)
      println(f"PROF r11_hyb_build              ${(System.nanoTime() - t0) / 1e9}%8.2f s $hTag")
      (r, ())
    }
    val hqe = sq.hybridProbe(s)
    val hdepths = time("r11_hyb_calibrate", hTag)(sq.hybridCalibrate(vidx, hqe))
    println(s"PROF r11_hyb_depth ${hdepths(0L)} of ${vidx.numCells} cells $hTag")
    def hybOnce(): Unit =
      sq.hybridServeIndexed(s, tidx, vidx, hqe, hdepths)
        .write.format("noop").mode("overwrite").save()
    time("r11_hyb_serve_cold", hTag)(hybOnce())
    (1 to 2).foreach(i => time(s"r11_hyb_serve_warm$i", hTag)(hybOnce()))
    time("r11_hyb_exact_rrf", hTag)(
      graft.queries.Registry.queries("q_hybrid_rrf")(s, dir)
        .write.format("noop").mode("overwrite").save())

    // graph twin: per-probe beam policy at a 256 panel, hot and cold.
    // The stress fixture REPLICATES each base row 20x/100x — every
    // neighborhood is a pile of exact-distance ties, so "recall the
    // tie-broken exact id set" is ill-posed for ANY walk (the exact arm's
    // 5 smallest-id copies are indistinguishable from the other copies by
    // geometry). A deterministic per-id perturbation restores distinct
    // geometry without changing the scale shape.
    val gvectors = vectors.select(col("id"),
      expr("transform(emb, (x, i) -> CASE WHEN i = CAST(id % 64 AS INT) " +
        "THEN x + CAST(id % 997 AS FLOAT) * CAST(1e-4 AS FLOAT) " +
        "ELSE x END)").as("emb"))
    val gpanel = gvectors.orderBy(xxhash64(col("id")), col("id")).limit(256)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getSeq[Float](1).toArray)).toSeq
    val bits = scaledBits(n)
    val gidx = new GraphIndex(s, graft.store.Scratch.dir("scale_r11_g"), k = 8,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
    time("r11_graph_build", nTag)(gidx.build(gvectors))
    val beams = time("r11_graph_beams_256", nTag)(
      gidx.exactBeams(gpanel, 5, ladder = Seq(2, 8, 32, 128), hops = 8))
    println(s"PROF r11_beams_hist ${beams.values.groupBy(identity)
      .map { case (b, v) => s"$b:${v.size}" }.toSeq.sorted.mkString(",")} $nTag")
    time("r11_graph_hot_256", nTag)(
      gidx.hotQueryBatch(gpanel, 5, 4, 6, beamOf = beams).length: Unit)
    time("r11_graph_batch_256", nTag)(
      gidx.queryBatch(gpanel, 5, 4, 6, beamOf = beams)
        .write.format("noop").mode("overwrite").save())
    s.stop()
  }

  private def r10(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val sq = graft.queries.SearchQueries
    val nd = s.read.parquet(s"$dir/documents.parquet").count()
    val nTag = s"(docs=$nd)"
    val (idx, probes) = time("r10_rag_build", nTag)(
      (sq.ragBuildIndex(s, dir), sq.ragProbePanel(s)))
    println(s"PROF r10_rag_chunks n=${sq.ragChunks(s, dir).count()} $nTag")
    val depths = time("r10_rag_calibrate", nTag)(sq.ragCalibrate(idx, probes))
    println(s"PROF r10_rag_depths ${depths.toSeq.sortBy(_._1)
      .map { case (p, d) => s"q$p=$d" }.mkString(",")} of ${idx.numCells} $nTag")
    def serveOnce(d: Map[Long, Int]): Unit =
      sq.ragServeIndexed(s, idx, probes, d)
        .write.format("noop").mode("overwrite").save()
    time("r10_rag_serve_cold", nTag)(serveOnce(depths))
    (1 to 2).foreach(i => time(s"r10_rag_serve_warm$i", nTag)(serveOnce(depths)))
    // the DEPLOYMENT policy (recall ~0.9, the attachIvfIndex(recallTarget=)
    // shape): constant rung count over constant-size cells = flat bytes —
    // the serving number that must NOT grow 20x -> 100x
    val kk = sq.RagChunkK + sq.RagCosMargin
    val ladder = Iterator.iterate(1)(_ * 2).takeWhile(_ < idx.numCells).toSeq :+ idx.numCells
    val d90 = idx.calibrationSweep(probes, kk, ladder).collect()
      .collectFirst { case r if r.getDouble(3) >= 0.9 => r.getInt(0) }
      .getOrElse(idx.numCells)
    println(s"PROF r10_rag_depth90 nprobe=$d90 of ${idx.numCells} $nTag")
    val d90m = probes.map { case (pid, _) => pid -> d90 }.toMap
    time("r10_rag_serve90_cold", nTag)(serveOnce(d90m))
    (1 to 2).foreach(i => time(s"r10_rag_serve90_warm$i", nTag)(serveOnce(d90m)))
    s.stop()
  }

  private def r9(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    import org.apache.spark.sql.expressions.Window

    // ---- calibration: sweep cost vs ONE exact panel pass
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cells = math.max(16, (n / 2048L).toInt)
    val ibase = graft.store.Scratch.dir("scale_r9_ivf")
    val idx = new IvfIndex(s, ibase, cells)
    time(s"r9_cal_build_${cells}cells", nTag)(idx.build(vectors))
    val panel = idx.calibrationPanel(64)
    // the reference cost: one exact panel x corpus scored pass
    time("r9_cal_exact_panel_pass", nTag) {
      val probesDf = s.createDataFrame(
        panel.map { case (pid, pe) => (pid, pe.toSeq) }).toDF("pid", "pe")
      println("PROF r9_cal_exact_rows rows=" +
        vectors.crossJoin(broadcast(probesDf))
          .select(col("pid"), VF.l2Sq(col("emb"), col("pe")).as("d"))
          .groupBy("pid").agg(min("d")).count())
    }
    time("r9_cal_sweep_5depths", nTag)(
      println("PROF r9_cal_sweep rows=" +
        idx.calibrationSweep(panel, k = 10,
          ladder = Seq(1, 2, 4, 8, cells), excludeSelf = true).count()))
    time("r9_cal_choose", nTag)(
      println(s"PROF r9_cal_chosen nprobe=${idx.calibrateNprobe(10, 0.9, 64)}"))

    // ---- GraphIndex SQ8 hot serving inside the codes-fit window
    val gbase = graft.store.Scratch.dir("scale_r9_g")
    val bits = scaledBits(n)
    val gidx = new GraphIndex(s, gbase, k = 8,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 8)
    time("r9_graph_build", nTag)(gidx.build(vectors))
    val qe = vectors.filter(col("id") === 17).head().getSeq[Float](1).toArray
    def tree(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).map(walk).sum
      walk(new java.io.File(root))
    }
    val dim = qe.length
    val est = n * (dim + 48L) + gidx.graph.count() * 8L
    val raw = tree(s"$gbase/vectors") + tree(s"$gbase/graph")
    println(s"PROF r9_graph_window codes_est=$est raw_tree=$raw $nTag")
    val prevBudget = System.getProperty("graft.hot.maxBytes")
    System.setProperty("graft.hot.maxBytes", est.toString) // inside the window
    try {
      time("r9_graph_hotq_cold", nTag)(
        require(gidx.hotQueryQuantized(qe, 5, 8, 4, rerank = 64).isDefined))
      (1 to 2).foreach { i =>
        time(s"r9_graph_hotq_warm$i", nTag)(
          gidx.hotQueryQuantized(qe, 5, 8, 4, rerank = 64): Unit)
      }
    } finally {
      if (prevBudget == null) System.clearProperty("graft.hot.maxBytes")
      else System.setProperty("graft.hot.maxBytes", prevBudget)
    }
    time("r9_graph_coldq", nTag)(
      gidx.queryQuantized(qe, 5, 8, 4, rerank = 64).collect(): Unit)

    // ---- chunk -> doc RAG retrieval (the q_rag_retrieve pipeline)
    val sq = graft.queries.SearchQueries
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    def ragOnce(): Long = {
      import s.implicits._
      val chunks = docs
        .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        .withColumn("nn", size(col("toks")))
        .select(col("doc_id"),
          posexplode(sequence(lit(0), greatest(col("nn") - 1, lit(0)),
            lit(sq.RagStride))).as(Seq("chunk_id", "strt")),
          col("toks"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          TF.hashEmbed(slice(col("toks"), col("strt") + 1, lit(sq.RagWindow)),
            sq.EmbDim).as("emb"))
      val probes = sq.RagProbes.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }.toDF("qid", "qtext")
        .select(col("qid"), TF.hashEmbed(TF.tokens(col("qtext")), sq.EmbDim).as("qe"))
      chunks.crossJoin(broadcast(probes))
        .select(col("qid"),
          (shiftleft(col("doc_id"), 20) + col("chunk_id")).as("cid"),
          VF.cosine(col("emb"), col("qe")).as("cos"))
        .groupBy("qid")
        .agg(graft.operators.GroupedTopK.topK(sq.RagChunkK)(
          -col("cos"), col("cid")).as("tk"))
        .count()
    }
    time("r9_rag_cold", s"(docs=$nd)")(println(s"PROF r9_rag_rows rows=${ragOnce()}"))
    (1 to 2).foreach(i => time(s"r9_rag_warm$i", s"(docs=$nd)")(ragOnce(): Unit))

    // ---- positional upgrade: cost tracks the PRE-GEN fraction, corpus fixed
    Seq(10L, 50L).foreach { pct =>
      val tb = graft.store.Scratch.dir(s"scale_r9_upg$pct")
      val tidx = new graft.store.TextIndex(s, tb, numBuckets = 64)
      val old = docs.filter(pmod(col("doc_id"), lit(100)) < pct)
      val rest = docs.filter(pmod(col("doc_id"), lit(100)) >= pct)
      tidx.build(old)
      tidx.appendBatch(rest, 1L)
      // strip pos from batch=0 (simulate a pre-positions generation)
      val b0 = new java.io.File(s"$tb/postings/batch=0")
      val st = graft.store.Scratch.dir("scale_r9_upg_st")
      s.read.parquet(b0.getPath).drop("pos")
        .write.mode("overwrite").partitionBy("bucket").parquet(st)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(b0)
      require(new java.io.File(st).renameTo(b0))
      time(s"r9_upgrade_${pct}pct_pregen", s"(docs=$nd)")(
        println(s"PROF r9_upgraded gens=${tidx.upgradePositions(docs)}"))
    }
    s.stop()
  }

  /** Boolean / prefix / percolate at scale (r8): the three new text
    * surfaces. Pass criteria across /tmp/scale20 vs /tmp/scale100: the
    * boolean and prefix probes are df-bounded like the BM25 probe (the
    * q/numBuckets contract — warm probes track posting volume, never the
    * corpus); percolation is one term-keyed join + one (doc, profile)
    * aggregation, linear in the corpus with profile count a constant. */
  private def textserve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    val nTag = s"(docs=$nd)"
    val sq = graft.queries.SearchQueries
    val tbase = graft.store.Scratch.dir("scale_tidx_ts")
    val tidx = new graft.store.TextIndex(s, tbase, 64)
    time("ts_build_64buckets", nTag)(tidx.build(docs))
    time("ts_boolean_cold", nTag)(println(s"PROF ts_bool_rows rows=" +
      tidx.booleanQuery(sq.BoolMust, sq.BoolShould, sq.BoolNot, 10).count()))
    (1 to 2).foreach { i =>
      time(s"ts_boolean_warm$i", nTag)(
        tidx.booleanQuery(sq.BoolMust, sq.BoolShould, sq.BoolNot, 10).collect(): Unit)
    }
    time("ts_hot_bool_load", nTag)(
      tidx.hotBooleanQuery(sq.BoolMust, sq.BoolShould, sq.BoolNot, 10): Unit)
    (1 to 2).foreach { i =>
      time(s"ts_hot_bool_warm$i", nTag)(
        tidx.hotBooleanQuery(sq.BoolMust, sq.BoolShould, sq.BoolNot, 10): Unit)
    }
    time("ts_expand_prefix", nTag)(
      println(s"PROF ts_expansion terms=${tidx.expandPrefix(sq.PrefixStr, 4)}"))
    (1 to 2).foreach { i =>
      time(s"ts_prefix_warm$i", nTag)(
        tidx.prefixQuery(sq.PrefixStr, 10, sq.PrefixMax).collect(): Unit)
    }
    // percolation: the whole fixture corpus as one arriving batch
    val profiles = sq.percProfilesDf(s)
    time("ts_percolate", nTag)(println(s"PROF ts_perc_rows rows=" +
      graft.operators.Percolate.matches(docs, profiles).count()))
    s.stop()
  }

  /** Exact-pruned search at scale: triangle-inequality cell pruning
    * (IvfIndex.queryExact / rangeSearch) on a CLUSTERED corpus of the
    * fixture's cardinality — the regime the bound exists for (real
    * embedding spaces cluster; the uniform stress vectors are
    * near-equidistant in 64-dim and prune nothing, which the honest
    * `uniform_*` rows measure rather than hide). Pass criterion across
    * /tmp/scale20 vs /tmp/scale100: the exact pruned probe tracks the
    * CANDIDATE cells (~flat for a fixed cluster count) while the exact
    * brute scan grows with the corpus; candidate fractions printed. */
  private def exactserve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val C = 64 // clusters AND cells
    // deterministic clustered corpus: per-(cluster, dim) center on a
    // coarse integer lattice (multiples of 4), per-(id, dim) jitter < 1
    val clustered = e.select(col("vec_id").as("id"))
      .withColumn("cl", pmod(col("id"), lit(C.toLong)))
      .withColumn("emb", transform(sequence(lit(0), lit(63)), j =>
        (pmod(col("cl") * 131 + j.cast("long") * 17, lit(23L)).cast("double") * 4.0 +
          pmod(col("id") * 31 + j.cast("long") * 7, lit(11L)).cast("double") / 11.0)
          .cast("float")))
      .select("id", "emb")
    val base = graft.store.Scratch.dir("scale_exidx")
    val idx = new IvfIndex(s, base, C)
    time("exact_build", nTag)(idx.build(clustered))
    val qe = clustered.filter(col("id") === 5).select("emb")
      .head().getSeq[Float](0).toArray
    val cand = idx.exactCandidateCells(qe, k = 10, probe0 = 2)
    println(s"PROF exact_cand_cells ${cand.length}/$C $nTag")
    time("exact_pruned_cold", nTag)(idx.queryExact(qe, 10, probe0 = 2).collect())
    (1 to 3).foreach { i =>
      time(s"exact_pruned_warm$i", nTag)(idx.queryExact(qe, 10, probe0 = 2).collect())
    }
    (1 to 3).foreach { i =>
      time(s"exact_brute_warm$i", nTag)(idx.query(qe, 10, nprobe = C).collect())
    }
    val rr = 16.0 // covers the probe's whole cluster, excludes the lattice gap
    println(s"PROF range_cand_cells ${idx.rangeCandidateCells(qe, rr).length}/$C $nTag")
    (1 to 3).foreach { i =>
      time(s"range_warm$i", nTag)(idx.rangeSearch(qe, rr).count())
    }
    // hot exact serving: the resident tier answers the SAME exact probes
    // with zero Spark jobs warm (state loads once per publish)
    time("exact_hot_cold", nTag)(idx.hotQueryExact(qe, 10, probe0 = 2))
    (1 to 3).foreach { i =>
      time(s"exact_hot_warm$i", nTag)(idx.hotQueryExact(qe, 10, probe0 = 2))
    }
    (1 to 3).foreach { i =>
      time(s"range_hot_warm$i", nTag)(idx.hotRangeSearch(qe, rr).size)
    }
    // index range JOINS on the same clustered corpus: the near-dup
    // self-join blocks to qualifying cell pairs (diagonal-only here — the
    // N²/2 → sum-of-block-products claim), the probe-frame range join is
    // linear in probes × their candidate blocks
    val sjr = 2.5
    println(s"PROF selfjoin_cand_pairs ${idx.selfJoinCellPairs(sjr).length}/${C * (C + 1) / 2} $nTag")
    (1 to 3).foreach { i =>
      val n = time(s"selfjoin_warm$i", nTag)(idx.selfJoinWithin(sjr).count())
      if (i == 1) println(s"PROF selfjoin_pairs $n $nTag")
    }
    val probes = clustered.filter(pmod(col("id"), lit(97L)) === 0)
      .select(col("id").as("qid"), col("emb").as("qe"))
    println(s"PROF rangejoin_probes ${probes.count()} $nTag")
    (1 to 3).foreach { i =>
      val n = time(s"rangejoin_warm$i", nTag)(idx.rangeJoin(probes, rr).count())
      if (i == 1) println(s"PROF rangejoin_rows $n $nTag")
    }
    // the honest row: uniform fixture vectors are near-equidistant —
    // τ cannot beat any cell's lower bound and the exact probe IS brute
    val uniform = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val ubase = graft.store.Scratch.dir("scale_exidx_u")
    val uidx = new IvfIndex(s, ubase, math.max(16, (n / 2048L).toInt))
    time("uniform_build", nTag)(uidx.build(uniform))
    val uqe = uniform.filter(col("id") === 5).select("emb")
      .head().getSeq[Float](0).toArray
    val ucand = uidx.exactCandidateCells(uqe, k = 10, probe0 = 2)
    println(s"PROF uniform_cand_cells ${ucand.length} $nTag")
    (1 to 3).foreach { i =>
      time(s"uniform_exact_warm$i", nTag)(uidx.queryExact(uqe, 10, probe0 = 2).collect())
    }
    s.stop()
  }

  /** PQ-coded persistent IvfIndex at scale — sq8serve's 32x sibling: build
    * (IVF training + per-subspace codebooks + the m-byte codes column),
    * then warm raw vs ADC-quantized probes, and the codes-resident hot
    * tier with the budget pinned where even SQ8 codes would NOT fit
    * (between the PQ and SQ8 estimates — the tier only PQ can serve).
    * Pass criterion across /tmp/scale20 vs /tmp/scale100: ~flat probes
    * (cells scale with the corpus), build ~linear. */
  private def pqserve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val nTag = s"(n=$n)"
    val cells = math.max(16, (n / 2048L).toInt)
    val qe = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val base = graft.store.Scratch.dir("scale_pqidx")
    val idx = new graft.store.IvfIndex(s, base, cells)
    time("pq_build", nTag)(idx.build(corpus, codes = "pq", pqM = 8))
    time("pq_raw_cold", nTag)(idx.query(qe, 5, 4).collect())
    (1 to 3).foreach { i =>
      time(s"pq_raw_warm$i", nTag)(idx.query(qe, 5, 4).collect())
    }
    time("pq_adc_cold", nTag)(idx.queryQuantized(qe, 5, 4, shortlist = 64).collect())
    (1 to 3).foreach { i =>
      time(s"pq_adc_warm$i", nTag)(idx.queryQuantized(qe, 5, 4, shortlist = 64).collect())
    }
    val pqEst = n * (8 + 40L)
    val sqEst = n * (64 + 40L)
    println(s"PROF pq_hot_window pq_est=$pqEst sq8_est=$sqEst $nTag")
    System.setProperty("graft.hot.maxBytes", ((pqEst + sqEst) / 2).toString)
    try {
      time("pq_hot_load", nTag)(idx.hotQueryQuantized(qe, 5, 4, shortlist = 64))
      (1 to 3).foreach { i =>
        time(s"pq_hot_warm$i", nTag)(idx.hotQueryQuantized(qe, 5, 4, shortlist = 64))
      }
    } finally System.clearProperty("graft.hot.maxBytes"): Unit
    s.stop()
  }

  /** Phrase search at scale (r7 verdict item 6): positional-postings build
    * vs the plain build, then the phrase probe. Pass criterion across
    * /tmp/scale20 vs /tmp/scale100: probe cost tracks the queried terms'
    * POSTING VOLUME (df-bounded — the same q/numBuckets contract as the
    * BM25 probe), never the corpus; the build's position arrays cost a
    * ~constant factor. */
  private def phrase(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    val nTag = s"(docs=$nd)"
    val tbase = graft.store.Scratch.dir("scale_tidx_ph")
    val tidx = new graft.store.TextIndex(s, tbase, 64)
    time("phr_build_64buckets", nTag)(tidx.build(docs))
    val ph = graft.queries.SearchQueries.PhraseTerms
    time("phr_query_cold", nTag)(
      println(s"PROF phr_rows rows=${tidx.phraseQuery(ph, 10).count()}"))
    (1 to 2).foreach { i =>
      time(s"phr_query_warm$i", nTag)(tidx.phraseQuery(ph, 10).collect(): Unit)
    }
    // 3-term phrase: one more pruned term's postings, same shape
    time("phr_query3_warm", nTag)(
      tidx.phraseQuery(Seq("big", "table", "hash"), 10).collect(): Unit)
    // the BM25 probe for comparison (same pruning contract)
    time("phr_bm25_warm", nTag)(
      tidx.query(graft.queries.SearchQueries.QueryTerms, 10).collect(): Unit)
    // hot tier: first call loads the terms' position lists, then probes
    // are pure in-memory binary-search walks — zero Spark jobs warm
    time("phr_hot_load", nTag)(tidx.hotPhraseQuery(ph, 10))
    (1 to 3).foreach { i =>
      time(s"phr_hot_warm$i", nTag)(tidx.hotPhraseQuery(ph, 10))
    }
    val nt = graft.queries.SearchQueries.NearTerms
    time("phr_hot_near_load", nTag)(tidx.hotNearQuery(nt._1, nt._2, 3, 10))
    time("phr_hot_near_warm", nTag)(tidx.hotNearQuery(nt._1, nt._2, 3, 10))
    s.stop()
  }

  /** Drift-retrain at scale (r7 verdict item 1): build a trained IVF index,
    * flood it with a 30%-of-corpus shifted append (every value outside the
    * frozen SQ8 grid, piled into the shift-direction cells), then measure
    * the skew/clip the flood planted, the probe cost it degraded, the
    * retrain that repairs both, and the probe cost after. Pass criterion
    * across /tmp/scale20 vs /tmp/scale100: retrain cost tracks the corpus
    * ~linearly (it IS a rebuild over live rows); post-retrain skew and
    * clip-rate collapse at every scale; probe cost recovers to ~the
    * pre-flood number. */
  private def retrainStress(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val nTag = s"(n=$n)"
    val cells = math.max(16, (n / 2048L).toInt)
    val qe = e.filter(col("vec_id") === 17)
      .head().getAs[Seq[Float]]("embedding").toArray
    val base = graft.store.Scratch.dir("scale_retrain")
    val idx = new IvfIndex(s, base, cells)
    time(s"rt_build_${cells}cells", nTag)(idx.build(corpus))
    time("rt_probe_preflood", nTag)(idx.query(qe, 5, 4).collect())
    val flood = corpus.filter(col("id") % 10 < 3)
      .select((col("id") + lit(10L * n)).as("id"),
        transform(col("emb"), x => (x + lit(4.0f)).cast("float")).as("emb"))
    time("rt_flood_append_30pct", nTag)(idx.append(flood))
    val bal1 = time("rt_balance_postflood", nTag)(idx.balance())
    println(f"PROF rt_skew_postflood maxOverMean=${bal1.maxOverMean}%.2f clip=${bal1.sq8ClipRate}%.3f $nTag")
    // a probe toward the drifted mass hits the flood's fat cell
    val qDrift = qe.map(_ + 4.0f)
    time("rt_probe_drifted_cell", nTag)(idx.query(qDrift, 5, 4).collect())
    time("rt_retrain", nTag)(idx.retrain())
    val bal2 = time("rt_balance_postretrain", nTag)(idx.balance())
    println(f"PROF rt_skew_postretrain maxOverMean=${bal2.maxOverMean}%.2f clip=${bal2.sq8ClipRate}%.3f $nTag")
    time("rt_probe_postretrain", nTag)(idx.query(qe, 5, 4).collect())
    time("rt_probe_drifted_postretrain", nTag)(idx.query(qDrift, 5, 4).collect())
    s.stop()
  }

  /** Index-routed bulk labeling vs the exact scan (r7 verdict item 2): a
    * FIXED 64-probe labeling batch against a growing labeled corpus. The
    * exact path (q_knn_classifier's ProbeJoin + GroupedTopK vote) computes
    * P×N distances — linear in N at fixed P; the routed path
    * (AnnQueries.routedKnnVotes through IvfIndex.queryBatchQuantized)
    * scans the union of probed cells' CODES plus a bounded rerank — the
    * per-cell row count is ~fixed (cells scale with the corpus), so the
    * pass criterion across /tmp/scale20 vs /tmp/scale100 is a ~FLAT routed
    * vote where the exact vote grows ~5x. */
  private def routedlabel(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val probeDf = e.filter(col("vec_id") % 25 === 3 && col("vec_id") < AnnQueries.RecallPanelCap)
      .select(col("vec_id").as("pid"), col("embedding").as("pe")).persist()
    val probes = probeDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val labeled = e.filter(!(col("vec_id") % 25 === 3 && col("vec_id") < AnnQueries.RecallPanelCap))
      .select(col("vec_id").as("id"), col("embedding").as("emb"),
        col("label").cast("long").as("nlabel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("votes"), asc("nlabel"))
    time(s"lbl_exact_${probes.length}probes", nTag) {
      val knn = graft.operators.ProbeJoin.cross(labeled, probeDf)
        .withColumn("dist", VF.l2Sq(col("emb"), col("pe")))
        .groupBy("pid")
        .agg(graft.operators.GroupedTopK.topK(5)(col("dist"),
          col("id") * 16 + col("nlabel")).as("topk"))
        .select(col("pid"), explode(col("topk")).as("sc"))
        .select(col("pid"), pmod(col("sc.id"), lit(16L)).as("nlabel"))
      val out = knn.groupBy("pid", "nlabel").agg(count(lit(1)).as("votes"))
        .withColumn("vr", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("vr") === 1)
      println(s"PROF lbl_exact_rows rows=${out.count()}")
    }
    val cells = math.max(16, (n / 2048L).toInt)
    val base = graft.store.Scratch.dir("scale_lbl")
    val idx = new IvfIndex(s, base, cells)
    time(s"lbl_index_build_${cells}cells", nTag)(idx.build(labeled))
    time("lbl_routed_cold", nTag) {
      println(s"PROF lbl_routed_rows rows=${AnnQueries.routedKnnVotes(idx, probes, 5, 4, 64).count()}")
    }
    (1 to 2).foreach { i =>
      time(s"lbl_routed_warm$i", nTag)(
        AnnQueries.routedKnnVotes(idx, probes, 5, 4, 64).count(): Unit)
    }
    probeDf.unpersist()
    // corpus-FRACTION probes (4%) through the fully distributed DF route —
    // the shape where a Seq probe batch would collect a corpus fraction to
    // the driver; here NOTHING probe-sized leaves the executors. The exact
    // path on the same fraction is the P×N ProbeJoin scan (q_knn_classifier)
    // — linear in P·N; the routed DF path's phase-1 candidate volume is
    // P × (nprobe/numCells) of the corpus.
    val fracProbes = e.filter(col("vec_id") % 25 === 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("qe")).persist()
    val fp = fracProbes.count()
    time(s"lbl_routedDF_${fp}probes", nTag) {
      println("PROF lbl_routedDF_rows rows=" +
        AnnQueries.routedKnnVotesDF(idx, fracProbes, 5, 4, 64).count())
    }
    time(s"lbl_exact_${fp}probes", nTag) {
      val labeledP = fracProbes
        .select(col("probe_id").as("pid"), col("qe").as("pe"))
      val knn = graft.operators.ProbeJoin.cross(labeled, labeledP)
        .withColumn("dist", VF.l2Sq(col("emb"), col("pe")))
        .groupBy("pid")
        .agg(graft.operators.GroupedTopK.topK(5)(col("dist"),
          col("id") * 16 + col("nlabel")).as("topk"))
      println(s"PROF lbl_exact_frac_rows rows=${knn.count()}")
    }
    fracProbes.unpersist()
    s.stop()
  }

  /** Encrypted cell-pruned serving at scale (EncryptedStore.storeIndexed /
    * queryIndexed): build cost, brute-decrypt query vs pruned probe,
    * rotation. Cell count scales with the corpus (~2k rows/cell) so the
    * pass criterion across /tmp/scale20 vs /tmp/scale100 is a ~FLAT
    * pruned probe (it decrypts one cell either way) while the brute
    * decrypt query grows with the corpus. */
  private def encserve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val cells = math.max(16, (n / 2048L).toInt)
    val rows = e.select(col("vec_id").cast("string").as("id"),
      concat(lit("doc "), col("vec_id")).as("doc"), col("embedding").as("emb"))
    val qe = e.filter(col("vec_id") === 17)
      .head().getAs[Seq[Float]]("embedding").toArray
    val base = graft.store.Scratch.dir("scale_enc")
    val es = new graft.store.EncryptedStore(s, base, "0123456789abcdef")
    time(s"enc_build_${cells}cells", nTag)(es.storeIndexed(rows, "c", cells))
    time("enc_query_brute", nTag)(es.query("c", qe, 5).collect())
    time("enc_pruned_cold", nTag)(es.queryIndexed("c", qe, 5, nprobe = 1).collect())
    (1 to 3).foreach(i =>
      time(s"enc_pruned_warm$i", nTag)(es.queryIndexed("c", qe, 5, nprobe = 1).collect()))
    time("enc_pruned_nprobe4", nTag)(es.queryIndexed("c", qe, 5, nprobe = 4).collect())
    // batch probes (r8): 16 probes through ONE union-of-cells decrypt pass
    // vs the same 16 through the per-probe loop — the loop decrypts each
    // probed cell once per probe, the batch once per row
    val probes16 = e.orderBy("vec_id").limit(16).collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]]("embedding").toArray)).toSeq
    time("enc_batch16_raw", nTag)(
      es.queryIndexedBatch("c", probes16, 5, nprobe = 4).collect())
    time("enc_batch16_quant", nTag)(
      es.queryIndexedBatchQuantized("c", probes16, 5, nprobe = 4, shortlist = 64).collect())
    time("enc_loop16", nTag)(probes16.foreach { case (_, pe) =>
      es.queryIndexed("c", pe, 5, nprobe = 4).collect(): Unit
    })
    time("enc_rotate", nTag)(es.rotateKey("c", "fedcba9876543210"): Unit)
    s.stop()
  }

  /** Encrypted EXACT surfaces at scale — where the plaintext exactserve
    * rows measure scan bytes the fixture is too small to feel, here the
    * pruned-vs-brute gap is AES-GCM work and shows immediately: exact
    * top-k / range / self-join decrypt only the radius-bounded candidate
    * cells of a CLUSTERED corpus (same lattice as exactserve), brute
    * decrypts everything and grows with the corpus. */
  private def encexact(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val nTag = s"(n=$n)"
    val C = 64
    val clustered = e.select(col("vec_id").as("kid"))
      .withColumn("cl", pmod(col("kid"), lit(C.toLong)))
      .withColumn("emb", transform(sequence(lit(0), lit(63)), j =>
        (pmod(col("cl") * 131 + j.cast("long") * 17, lit(23L)).cast("double") * 4.0 +
          pmod(col("kid") * 31 + j.cast("long") * 7, lit(11L)).cast("double") / 11.0)
          .cast("float")))
      .select(format_string("id%09d", col("kid")).as("id"),
        concat(lit("doc "), col("kid")).as("doc"), col("emb"))
    val base = graft.store.Scratch.dir("scale_encex")
    val es = new graft.store.EncryptedStore(s, base, "0123456789abcdef")
    time("encexact_build", nTag)(es.storeIndexed(clustered, "c", C))
    val qe = clustered.filter(col("id") === "id000000005")
      .head().getAs[Seq[Float]]("emb").toArray
    println(s"PROF encexact_cand_cells ${es.encExactCandidateCells("c", qe, 10, 2).length}/$C $nTag")
    (1 to 3).foreach(i =>
      time(s"encexact_pruned_warm$i", nTag)(es.queryIndexedExact("c", qe, 10, probe0 = 2).collect()))
    (1 to 3).foreach(i =>
      time(s"encexact_brute_warm$i", nTag)(es.queryIndexed("c", qe, 10, nprobe = C).collect()))
    val rr = 16.0
    println(s"PROF encrange_cand_cells ${es.encRangeCandidateCells("c", qe, rr).length}/$C $nTag")
    (1 to 3).foreach(i =>
      time(s"encrange_warm$i", nTag)(es.rangeSearchIndexed("c", qe, rr).count()))
    val sjr = 2.5
    (1 to 3).foreach { i =>
      val m = time(s"encselfjoin_warm$i", nTag)(es.selfJoinIndexed("c", sjr).count())
      if (i == 1) println(s"PROF encselfjoin_pairs $m $nTag")
    }
    s.stop()
  }

  /** Regenerate the frozen QualityModel artifact from the sf0.01 fixture
    * (paste the printed Scala into functions/QualityModel.scala). */
  private def qualitytrain(args: Array[String]): Unit = {
    val s = session(8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.operators.QualityTrainer.printArtifact(
      s.read.parquet(s"$dir/documents.parquet"))
    s.stop()
  }

  private def queries(args: Array[String]): Unit = {
    val s = session(8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.queries.Registry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = try graft.queries.Registry.queries(name)(s, dir).count()
        finally graft.queries.Registry.releasePending()
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    s.stop()
  }

  /** Bisect of shingle-set materialization cost (which stage of the dedup
    * family's shared token/shingle frames is worth persisting). */
  private def shingle(args: Array[String]): Unit = {
    val s = session(8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def raw = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), TF.shingles(col("toks"), 3).as("sg"))
    def mk = raw.select(col("doc_id"), col("lang"),
      array_sort(array_distinct(TF.tokenHashes(col("sg")))).as("sh"))
    time("compute only (agg size)")(mk.select(sum(size(col("sh")))).count())
    time("compute only (noop write)") {
      mk.write.format("noop").mode("overwrite").save()
    }
    val d1 = mk.persist()
    time("persist sorted sets")(d1.count())
    d1.unpersist(true)
    time("localCheckpoint")(mk.localCheckpoint(true).count())
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

  /** Scale-stress the trained operators (SURVEY §8.3): IVF build + probe,
    * graph build at calibrated bucket width, in-memory beam serve.
    * PROF_FIXED6=1 adds the miscalibrated fixed-6-bit build for contrast. */
  private def scale(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val nTag = s"(n=$n)"
    val qe = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val base = graft.store.Scratch.dir("scale_ivf")
    val idx = new IvfIndex(s, base, 16)
    time("ivf_build_trained", nTag)(idx.build(corpus))
    val sizes = s.read.parquet(s"$base/data").groupBy("cell").count()
      .collect().map(_.getLong(1))
    println(s"PROF ivf_cells max=${sizes.max} mean=${sizes.sum / sizes.length}")
    time("ivf_probe", nTag)(idx.query(qe, 5, 4).collect())
    time("ivf_hot_load", nTag)(idx.hotQuery(qe, 5, 4))
    time("ivf_hot_probe", nTag)(idx.hotQuery(qe, 5, 4))
    val bits = scaledBits(n)
    if (sys.env.contains("PROF_FIXED6"))
      time("graph_build_6bit_fixed", nTag) {
        KnnGraph.build(corpus, Seq(bucketFn(0, 6), bucketFn(200, 6)), 4).count()
      }
    val cached = corpus.persist()
    val g = time(s"graph_build_${bits}bit_scaled", nTag) {
      val g = KnnGraph.build(cached, Seq(bucketFn(0, bits), bucketFn(200, bits)), 4)
        .persist()
      g.count(); g
    }
    time("beam_inmem_cold", nTag)(
      KnnGraph.beamSearch(g, cached, qe, 5, 4, 3, Seq(1L, 2L)).collect())
    time("beam_inmem_warm", nTag)(
      KnnGraph.beamSearch(g, cached, qe, 5, 4, 3, Seq(1L, 2L)).collect())
    s.stop()
  }

  /** Persistent GraphIndex serving + maintenance at scale: after one build,
    * every number here must be ~invariant in corpus size — the walk touches
    * O(hops·beam·k) rows via In-pruned point reads, and an insert touches
    * O(|batch|·bucket) candidates. Compare across /tmp/scale20 vs
    * /tmp/scale100 runs. */
  /** Reference-dim envelope (r6 verdict item 7): the fixtures fix dim 64,
    * the reference embeds at 384 (all-MiniLM-L6-v2, src/embeddings.py:3).
    * Expand the stress corpus to 384 dims (six deterministic scaled tiles
    * of each 64-dim vector — same row count, 6x the floats), land it as
    * parquet so scans are real, and measure the kNN + IVF family at the
    * reference's operating point. Pass criterion: ~linear in dim vs the
    * same measurements at 64 (the kernels are per-dim loops; nothing in
    * the plan shape depends on dim). */
  private def dim384(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e64 = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e64.count()
    val nTag = s"(n=$n dim=384)"
    val tiles = (0 until 6).map { j =>
      transform(col("embedding"), x => (x * lit(1.0f / (j + 1))).cast("float"))
    }
    val out = graft.store.Scratch.dir("dim384")
    time("d384_expand_write", nTag)(
      e64.select(col("vec_id"), concat(tiles: _*).as("embedding"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet"))
    val e = s.read.parquet(s"$out/embeddings.parquet")
    val qe = e.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    (1 to 3).foreach { i =>
      time(s"d384_knn_cosine$i", nTag)(
        e.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), VF.cosine(col("embedding"), typedlit(qe)).as("c"))
          .orderBy(desc("c"), asc("vec_id")).limit(5).collect())
    }
    val cells = math.max(16, (n / 2048L).toInt)
    val base = graft.store.Scratch.dir("dim384_ivf")
    val idx = new IvfIndex(s, base, cells)
    time("d384_ivf_build", nTag)(
      idx.build(e.select(col("vec_id").as("id"), col("embedding").as("emb"))))
    (1 to 3).foreach { i =>
      time(s"d384_ivf_probe$i", nTag)(idx.query(qe, 5, 4).collect())
    }
    (1 to 3).foreach { i =>
      time(s"d384_sq8_probe$i", nTag)(idx.queryQuantized(qe, 5, 4, shortlist = 64).collect())
    }
    s.stop()
  }

  /** SQ8 probe path of the persistent IvfIndex at scale: build (includes
    * the stats pass + codes column), then warm raw probe vs warm quantized
    * probe (codes shortlist + exact rerank). Cells scale with the corpus
    * (~2k rows/cell) so both probes read a ~fixed row count per cell and
    * the pass criterion across /tmp/scale20 vs /tmp/scale100 is ~FLAT
    * probe times; the quantized probe's phase-1 bytes are the codes
    * column's (3.7x smaller on disk, IvfIndexSpec). */
  private def sq8serve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val nTag = s"(n=$n)"
    val cells = math.max(16, (n / 2048L).toInt)
    val qe = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val base = graft.store.Scratch.dir("scale_sq8idx")
    val idx = new graft.store.IvfIndex(s, base, cells)
    time("sq8_build", nTag)(idx.build(corpus))
    time("sq8_raw_cold", nTag)(idx.query(qe, 5, 4).collect())
    (1 to 3).foreach { i =>
      time(s"sq8_raw_warm$i", nTag)(idx.query(qe, 5, 4).collect())
    }
    time("sq8_quant_cold", nTag)(idx.queryQuantized(qe, 5, 4, shortlist = 64).collect())
    (1 to 3).foreach { i =>
      time(s"sq8_quant_warm$i", nTag)(idx.queryQuantized(qe, 5, 4, shortlist = 64).collect())
    }
    // codes-resident hot tier (r8): pin the budget INSIDE the window —
    // above the code-bytes estimate, below the raw file tree — so this is
    // the index a raw hot tier could NOT pin, now serving hot: phase 1
    // in-memory over codes, phase 2 the bounded In-pushed rerank
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    val treeBytes = walk(new java.io.File(s"$base/data"))
    val codesEst = n * (64 + 40L)
    println(s"PROF sq8_hot_window codes_est=$codesEst tree_bytes=$treeBytes $nTag")
    System.setProperty("graft.hot.maxBytes", ((codesEst + treeBytes) / 2).toString)
    try {
      time("sq8_hot_load", nTag)(idx.hotQueryQuantized(qe, 5, 4, shortlist = 64))
      (1 to 3).foreach { i =>
        time(s"sq8_hot_warm$i", nTag)(idx.hotQueryQuantized(qe, 5, 4, shortlist = 64))
      }
    } finally System.clearProperty("graft.hot.maxBytes"): Unit
    s.stop()
  }

  private def serve(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val nTag = s"(n=$n)"
    val qe = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val bits = scaledBits(n)
    val base = graft.store.Scratch.dir("scale_gidx")
    val idx = new GraphIndex(s, base, 4,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 4)
    time("gidx_build", nTag)(idx.build(corpus, refineRounds = 1))
    time("gidx_query_cold", nTag)(idx.query(qe, 5, 4, 6).collect())
    (1 to 3).foreach { i =>
      time(s"gidx_query_warm$i", nTag)(idx.query(qe, 5, 4, 6).collect())
    }
    // hot tier: first call loads the resolved state, then probes are pure
    // in-memory computation (the <=150ms warm target)
    time("gidx_hot_load", nTag)(idx.hotQuery(qe, 5, 4, 6))
    (1 to 3).foreach { i =>
      time(s"gidx_hot_query$i", nTag)(idx.hotQuery(qe, 5, 4, 6))
    }
    val probes = corpus.orderBy("id").limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    time("gidx_batch16", nTag)(idx.queryBatch(probes, 5, 4, 6).collect())
    // hop-count curve (r6 verdict): does fixed-entry routing degrade as
    // the graph grows? Report mean walk stats over the probe panel —
    // hops executed, nodes scored (per-query cost), and the hop after
    // which the final top-5 stopped changing (routing depth). Growth of
    // stableAt across scale20 -> scale100 is the signal that HNSW-style
    // entry layers would pay for themselves.
    val ws = probes.map { case (_, pe) => idx.hotQueryStats(pe, 5, 4, 6)._2 }
    def mean(f: graft.store.GraphIndex.WalkStats => Int): Double =
      ws.map(f(_).toDouble).sum / ws.size
    println(f"PROF gidx_walkstats              hops=${mean(_.hopsExecuted)}%.1f " +
      f"scored=${mean(_.nodesScored)}%.0f stableAt=${mean(_.topKStableAt)}%.1f $nTag")
    // fixed-size insert batch with fresh ids: cost must track the BATCH,
    // not the corpus
    val maxId = corpus.agg(max("id")).head().getLong(0)
    val batch = corpus.orderBy("id").limit(1000)
      .withColumn("id", col("id") + lit(maxId + 1L))
    time("gidx_insert_1k", nTag)(idx.insert(batch))
    time("gidx_query_after_insert", nTag)(idx.query(qe, 5, 4, 6).collect())
    val batch2 = corpus.orderBy("id").limit(1000)
      .withColumn("id", col("id") + lit(2L * (maxId + 1L)))
    time("gidx_insert_1k_b2", nTag)(idx.insert(batch2))
    // fixed-size delete with edge repair: cost must track the BATCH (the
    // in-neighbor probe is a reverse-tree point read), not the corpus
    val deadIds = corpus.orderBy("id").limit(200).collect().map(_.getLong(0)).toSeq
    time("gidx_delete_200", nTag)(idx.delete(deadIds))
    time("gidx_query_after_delete", nTag)(idx.query(qe, 5, 4, 6).collect())
    time("gidx_compact", nTag)(idx.compact())
    time("gidx_query_after_compact", nTag)(idx.query(qe, 5, 4, 6).collect())
    s.stop()
  }

  /** Delete-at-scale ladder (round-6 verdict item 4): 1% / 10% / 35% of
    * the corpus deleted from a live GraphIndex, with post-delete query
    * latency after each rung. The 35% rung crosses
    * [[GraphIndex.PointDeleteCap]] at the 100x fixture (84k ids > 65536)
    * and exercises the DISTRIBUTED fallback path; the smaller rungs stay
    * on the reverse-tree point reads. Pass criterion across scale20 vs
    * scale100: each rung's cost tracks its BATCH (and its in-neighbor
    * count), never the corpus, and query latency stays flat. */
  private def delstress(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val qe = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val bits = scaledBits(n)
    val base = graft.store.Scratch.dir("scale_delstress")
    val idx = new GraphIndex(s, base, 4,
      Seq(bucketFn(0, bits), bucketFn(200, bits)), numEntries = 4)
    time("gidx_build", s"(n=$n)")(idx.build(corpus, refineRounds = 1))
    // disjoint id slices by rank (setup cost, untimed)
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val ranked = corpus.select(col("id"))
      .withColumn("rn", row_number().over(w)).persist()
    ranked.count()
    var offset = 0L
    Seq(0.01, 0.10, 0.35).foreach { frac =>
      val cnt = (n * frac).toLong
      val slice = ranked.filter(col("rn") > offset && col("rn") <= offset + cnt)
        .select("id")
      offset += cnt
      val path = if (cnt <= GraphIndex.PointDeleteCap) "point" else "scan"
      time(f"gidx_delete_${(frac * 100).toInt}%dpct",
        s"(n=$n, del=$cnt, path=$path)")(idx.delete(slice))
      time(f"gidx_query_after_${(frac * 100).toInt}%dpct", s"(n=$n)")(
        idx.query(qe, 5, 4, 6).collect())
    }
    time("gidx_compact_after_46pct", s"(n=$n)")(idx.compact())
    time("gidx_query_after_compact", s"(n=$n)")(idx.query(qe, 5, 4, 6).collect())
    ranked.unpersist()
    s.stop()
  }

  /** BPE encode cost vs merge-table size (round-6 verdict item 1): the
    * corpus-wide token count under the 48-rule and the 1000-rule tables
    * must cost ~the same — the greedy rank-table encoder touches the
    * table only through O(len) hash lookups. (The old per-rule-pass
    * encoder scaled linearly: ~20x at 1000 rules.) */
  private def bpe(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = session(8)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(TF.tokens(col("text")).as("toks")).persist()
    val nToks = docs.select(sum(size(col("toks")))).head().getLong(0)
    val tag = s"(tokens=$nToks)"
    time("bpe_warmup", tag)(docs.select(sum(graft.functions.Bpe.countTokens(
      col("toks"), graft.functions.Bpe.TrainedMerges))).head().getLong(0))
    Seq(1, 2).foreach { r =>
      val n48 = time(s"bpe_encode_48rules_r$r", tag)(
        docs.select(sum(graft.functions.Bpe.countTokens(
          col("toks"), graft.functions.Bpe.TrainedMerges))).head().getLong(0))
      val n1k = time(s"bpe_encode_1000rules_r$r", tag)(
        docs.select(sum(graft.functions.Bpe.countTokens(
          col("toks"), graft.functions.Bpe.TrainedMerges1k))).head().getLong(0))
      println(s"PROF bpe_tokens n48=$n48 n1k=$n1k")
    }
    docs.unpersist()
    s.stop()
  }

  /** Mining-operator stress (SURVEY §8.3): hard-negative mining at the
    * CALIBRATED bucket width (the registry query's fixed 6-bit buckets are
    * sized to the sf fixtures; production blocks with width growing with N
    * exactly like the graph build). Sublinear growth across /tmp/scale20 vs
    * /tmp/scale100 is the pass criterion. */
  private def mine(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale20")
    val s = session(32)
    val e0 = s.read.parquet(s"$dir/embeddings.parquet")
    val n = e0.count()
    val nTag = s"(n=$n)"
    val bits = scaledBits(n)
    val tables = Seq(0, 200, 400)
    val e = tables.zipWithIndex.foldLeft(
      e0.select(col("vec_id"), col("label"), col("embedding"))) { case (d, (off, i)) =>
      d.withColumn(s"b$i", bucketFn(off, bits)(col("embedding")))
    }.persist()
    time(s"hardneg_${bits}bit_3tab", nTag) {
      val pairs = tables.indices.map { i =>
        val a = e.select(col("vec_id").as("vec_a"), col("label").as("label_a"),
          col(s"b$i").as("ba"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
          col(s"b$i").as("bb"), col("embedding").as("eb"))
        a.join(b, col("ba") === col("bb") && col("label_a") =!= col("label_b"))
          .select(col("vec_a"), col("vec_b"),
            VF.cosine(col("ea"), col("eb")).as("cos_raw"))
      }.reduce(_.unionByName(_))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_a").orderBy(desc("cos_raw"), asc("vec_b"))
      val out = pairs.groupBy("vec_a", "vec_b").agg(min(col("cos_raw")).as("cos_raw"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
      println(s"PROF hardneg_rows rows=${out.count()}")
    }
    e.unpersist()
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val nd = docs.count()
    time("weighted_sample", s"(docs=$nd)") {
      graft.queries.Registry.queries("q_weighted_sample")(s, dir).count(): Unit
    }
    // disk inverted index: build is linear in token volume; the query scan
    // is bucket-pruned, so its cost tracks the QUERY TERMS' posting volume
    // (a df-proportional slice), not the corpus
    val tbase = graft.store.Scratch.dir("scale_tidx")
    val tidx = new graft.store.TextIndex(s, tbase, 64)
    time("tidx_build_64buckets", s"(docs=$nd)")(tidx.build(docs))
    time("tidx_query_cold", s"(docs=$nd)")(
      tidx.query(graft.queries.SearchQueries.QueryTerms, 10).collect())
    time("tidx_query_warm", s"(docs=$nd)")(
      tidx.query(graft.queries.SearchQueries.QueryTerms, 10).collect())
    time("tidx_hot_load", s"(docs=$nd)")(
      tidx.hotQuery(graft.queries.SearchQueries.QueryTerms, 10))
    time("tidx_hot_query", s"(docs=$nd)")(
      tidx.hotQuery(graft.queries.SearchQueries.QueryTerms, 10))
    s.stop()
  }
}
