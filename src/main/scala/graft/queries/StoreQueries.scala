package graft.queries

import graft.functions.{TextFunctions => TF}
import graft.store.{EncryptedStore, VectorStore}
import org.apache.spark.sql.functions._

/**
 * Driver-checkable queries over the store modules ([[graft.store.VectorStore]]
 * / [[graft.store.EncryptedStore]]). Each runs a full write -> read cycle in
 * a temp directory and emits a deterministic result the DuckDB oracle can
 * recompute from the source tables alone — verifying the store's round-trip
 * fidelity, duplicate-id rejection, and encrypt/decrypt identity.
 */
object StoreQueries {
  import Registry.tbl

  private[queries] val TestKey = "0123456789abcdef" // 16-byte AES key (test fixture)

  /** ONE copy of the encrypted-graph walk oracle — `q_encrypt_graph` and
    * `q_encrypt_graph_df` (the frame-probe route) share it VERBATIM, so a
    * hash match on both proves the two routes serve the same answers (the
    * q_hybrid_batch / q_hybrid_batch_df discipline). */
  private lazy val encGraphOracleSql: String = {
    val dEdge = OracleSql.l2Sq("a.embedding", "b.embedding")
    val dQ = OracleSql.l2Sq("c.embedding", "probe.qe")
    s"""WITH RECURSIVE
       |probe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |sigs AS (
       |  SELECT vec_id, embedding,
       |         ${AnnQueries.bucketSqlOff("embedding", 0)} AS b0,
       |         ${AnnQueries.bucketSqlOff("embedding", 200)} AS b1
       |  FROM embeddings WHERE vec_id <> 0),
       |cand AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst, $dEdge AS dist
       |  FROM sigs a JOIN sigs b ON a.b0 = b.b0 AND a.vec_id <> b.vec_id
       |  UNION ALL
       |  SELECT a.vec_id AS src, b.vec_id AS dst, $dEdge AS dist
       |  FROM sigs a JOIN sigs b ON a.b1 = b.b1 AND a.vec_id <> b.vec_id),
       |edges AS (SELECT src, dst, min(dist) AS dist FROM cand GROUP BY src, dst),
       |graph AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
       |    FROM edges) WHERE rn <= 4),
       |dists AS (
       |  SELECT c.vec_id, $dQ AS dist FROM embeddings c CROSS JOIN probe WHERE c.vec_id <> 0),
       |walk AS (
       |  SELECT 0 AS hop, [CAST(1 AS BIGINT), CAST(2 AS BIGINT)] AS visited
       |  UNION ALL
       |  SELECT s.hop + 1, w.visited
       |  FROM walk s, LATERAL (
       |    SELECT list_sort(list_distinct(s.visited || coalesce((
       |      SELECT list(DISTINCT g.dst)
       |      FROM graph g
       |      WHERE NOT list_contains(s.visited, g.dst)
       |        AND g.src IN (SELECT d.vec_id FROM dists d
       |                      WHERE list_contains(s.visited, d.vec_id)
       |                      ORDER BY d.dist, d.vec_id LIMIT 4)
       |    ), []))) AS visited
       |  ) w
       |  WHERE s.hop < 3)
       |SELECT d.vec_id, round(d.dist, 6) AS dist,
       |       'doc for vector ' || d.vec_id AS doc
       |FROM dists d, (SELECT visited FROM walk WHERE hop = 3) f
       |WHERE list_contains(f.visited, d.vec_id)
       |ORDER BY d.dist, d.vec_id LIMIT 5""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // S4-S6/P1-P3 + kNN: ingest documents (hash-embedded) into a parquet
    // collection, add AGAIN (dup-id rejection must keep count stable), then
    // run the store's top-5 L2 query for the embedded probe doc.
    Q(
      "q_store_roundtrip",
      "vector store ingest (with dup-id rejection) + top-5 L2 query",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_store")
        val store = new VectorStore(s, base)
        val coll = store.createOrGet("docs")
        val rows = tbl(s, dir, "documents")
          .select(col("doc_id").cast("string").as("id"), col("text").as("doc"),
            map(lit("lang"), col("lang")).as("meta"), TF.tokens(col("text")).as("toks"))
          .select(col("id"), col("doc"), col("meta"),
            TF.hashEmbed(col("toks"), AnnQueries.TextEmbDim).as("emb"))
        coll.add(rows)
        coll.add(rows) // duplicate ids -> all rejected, count unchanged
        val qe = coll.get(ids = Seq("0"), include = Seq("emb"))
          .head().getSeq[Float](1).toArray
        coll.query(qe, k = 5, metric = "l2")
          .select(col("id"), round(col("distance"), 6).as("dist"))
      },
      Some {
        val th = OracleText.tokenHashes(OracleText.tokens("text"))
        val dim = AnnQueries.TextEmbDim
        val cnt = s"list_transform(range(0, $dim), j -> " +
          s"CAST(len(list_filter(th, h -> h % $dim = j)) AS DOUBLE))"
        val nsq = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(cnt, c -> c*c)), (x, y) -> x + y)"
        val emb = s"CASE WHEN $nsq = 0 THEN list_transform(cnt, c -> CAST(c AS FLOAT)) " +
          s"ELSE list_transform(cnt, c -> CAST(c / sqrt($nsq) AS FLOAT)) END"
        val dist = OracleSql.l2Sq("e.emb", "probe.qe")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $th AS th FROM documents),
           |c AS MATERIALIZED (SELECT doc_id, $cnt AS cnt FROM t),
           |e AS MATERIALIZED (SELECT doc_id, $emb AS emb FROM c),
           |probe AS (SELECT emb AS qe FROM e WHERE doc_id = 0)
           |SELECT CAST(e.doc_id AS VARCHAR) AS id, round($dist, 6) AS dist
           |FROM e CROSS JOIN probe
           |ORDER BY $dist ASC, CAST(e.doc_id AS VARCHAR) ASC LIMIT 5""".stripMargin
      }),

    // S4 + Chroma update/upsert/delete parity: seed ids 0-299, upsert
    // 200-399 (replaces 200-299, inserts 300-399), update 350-449 (only
    // existing 350-399 touched — unknown ids MUST be ignored, or extra rows
    // appear and the oracle fails), then predicate-delete id%7=0. Each
    // mutation is a copy-on-write rewrite behind an atomic directory swap.
    Q(
      "q_store_upsert",
      "collection CRUD: add, upsert, update (unknown ids ignored), delete",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_crud")
        val store = new VectorStore(s, base)
        val coll = store.createOrGet("docs")
        val docs = tbl(s, dir, "documents")
        def rows(lo: Int, hi: Int, prefix: String) = docs
          .filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select(col("doc_id").cast("string").as("id"),
            concat(lit(prefix), col("text")).as("doc"),
            map(lit("lang"), col("lang")).as("meta"),
            lit(null).cast("array<float>").as("emb"))
        coll.add(rows(0, 300, ""))
        coll.upsert(rows(200, 400, "v2:"))
        coll.update(rows(350, 450, "v3:"))
        coll.deleteWhere(col("id").cast("long") % 7 === 0)
        coll.df.select(col("id").cast("long").as("doc_id"),
            length(col("doc")).as("dl"),
            when(substring(col("doc"), 1, 3) === "v3:", 3)
              .when(substring(col("doc"), 1, 3) === "v2:", 2)
              .otherwise(1).as("version"))
          .orderBy("doc_id")
      },
      Some(
        """WITH final AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id >= 350 THEN 'v3:' || text
          |              WHEN doc_id >= 200 THEN 'v2:' || text
          |              ELSE text END AS doc
          |  FROM documents WHERE doc_id < 400 AND doc_id % 7 <> 0)
          |SELECT doc_id, CAST(length(doc) AS INT) AS dl,
          |       CASE WHEN doc_id >= 350 THEN 3 WHEN doc_id >= 200 THEN 2 ELSE 1 END AS version
          |FROM final ORDER BY doc_id""".stripMargin)),

    // F11/S7: encrypted store round-trip — encrypt-at-rest (AES-GCM, random
    // IV per row) then authorized decrypt must reproduce every embedding
    // bit-for-bit. The oracle states the identity from plaintext alone.
    Q(
      "q_encrypt_roundtrip",
      "AES-GCM encrypt embeddings at rest, decrypt, verify exact identity",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_enc")
        val enc = new EncryptedStore(s, base, TestKey)
        val rows = tbl(s, dir, "embeddings")
          .select(col("vec_id").cast("string").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        enc.store(rows, "vectors")
        val original = tbl(s, dir, "embeddings")
          .select(col("vec_id").cast("string").as("id"), col("embedding"))
        enc.open("vectors")
          .join(original, "id")
          .select(col("id").cast("long").as("vec_id"),
            (col("emb") === col("embedding")).as("roundtrip_ok"),
            round(graft.functions.VectorFunctions.norm(col("emb")), 6).as("nrm"))
          .orderBy("vec_id")
      },
      Some(s"""SELECT vec_id, TRUE AS roundtrip_ok,
              |  round(sqrt(${OracleSql.normSq("embedding")}), 6) AS nrm
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Envelope encryption end-to-end: rows encrypt under a random DATA
    // key that exists at rest only WRAPPED by the master; the master then
    // ROTATES — an O(metadata) re-wrap, zero data bytes touched — and the
    // store reopened under the NEW master must serve the exact kNN, which
    // the oracle recomputes from plaintext alone. The query drives
    // open (DEK init) → storeIndexed → rotateMaster → reopen → pruned
    // decrypt search, the whole key-hierarchy lifecycle in one answer.
    Q(
      "q_envelope_search",
      "wrapped-DEK envelope store: master rotation then exact kNN under the new master",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_envq")
        val master = "envelope-master-0123456789abcdef" // 32 bytes
        val master2 = "ENVELOPE-master-0123456789abcdef"
        val enc = graft.store.Envelope.open(s, base, master)
        val rows = tbl(s, dir, "embeddings")
          .select(col("vec_id").cast("string").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        enc.storeIndexed(rows, "vectors", numCells = 8)
        graft.store.Envelope.rotateMaster(base, master, master2)
        val reopened = graft.store.Envelope.open(s, base, master2)
        val qe = tbl(s, dir, "embeddings").filter(col("vec_id") === 17)
          .head().getAs[Seq[Float]]("embedding").toArray
        reopened.queryIndexed("vectors", qe, k = 5, nprobe = 8)
          .select(col("id"), col("doc"), round(col("distance"), 6).as("dist"))
      },
      Some {
        val dist = OracleSql.l2Sq("e.embedding", "probe.qe")
        s"""WITH probe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 17)
           |SELECT CAST(e.vec_id AS VARCHAR) AS id,
           |       'doc for vector ' || e.vec_id AS doc,
           |       round($dist, 6) AS dist
           |FROM embeddings e CROSS JOIN probe
           |ORDER BY $dist ASC, CAST(e.vec_id AS VARCHAR) ASC LIMIT 5""".stripMargin
      }),

    // The reference's HEADLINE operation (cyborgdb_store.py:1-11):
    // similarity search over encrypted-at-rest vectors. storeIndexed
    // lands GCM ciphertext cell-partitioned by a trained IVF assignment
    // (encrypted centroid sidecar); queryIndexed reads only probed
    // partitions and decrypts only those rows. Run FULL-probe here so
    // the answer is the exact kNN — which the oracle recomputes from the
    // source table alone, checking the whole encrypt → partition →
    // prune → decrypt → score pipeline end to end. (EncryptedIndexSpec
    // pins the pruned-probe plan shape and the CRUD matrix.)
    // Encrypted DF-PROBE batched serving (r12): the probe side is a FRAME
    // the driver never collects, routed map-side against the encrypted
    // centroid sidecar (CellRoute — the plaintext queryBatchDF discipline
    // on ciphertext), phase 1 decrypting only routed-cell codes_ct, phase
    // 2 only shortlist-survivor emb_ct, both per-probe cuts the bounded
    // answers-not-candidates aggregate. Full probe depth + full shortlist
    // makes every probe's answer the EXACT kNN, which the oracle
    // recomputes from plaintext alone — gating routing, bounded decrypt,
    // the string-id TopKRows tie order, and the fused pipeline end to end.
    Q(
      "q_encrypt_batch_df",
      "encrypted DF-probe batch: frame routing + bounded decrypt, full depth == exact kNN per probe",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_encbdf")
        val enc = new EncryptedStore(s, base, TestKey)
        val rows = tbl(s, dir, "embeddings")
          .select(col("vec_id").cast("string").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        enc.storeIndexed(rows, "vectors", numCells = 8)
        val probesDf = tbl(s, dir, "embeddings")
          .filter(col("vec_id").isin(3L, 17L, 101L, 257L))
          .select(col("vec_id").as("probe_id"), col("embedding").as("qe"))
        enc.queryIndexedBatchDF("vectors", probesDf, k = 5, nprobe = 8,
            shortlist = 1 << 20)
          .select(col("probe_id"), col("rn"), col("id"), col("doc"),
            round(col("distance"), 6).as("dist"))
          .orderBy("probe_id", "rn")
      },
      Some {
        val d = OracleSql.l2Sq("e.embedding", "p.qe")
        s"""WITH probes AS MATERIALIZED (
           |  SELECT vec_id AS probe_id, embedding AS qe FROM embeddings
           |  WHERE vec_id IN (3, 17, 101, 257)),
           |scored AS (
           |  SELECT p.probe_id, e.vec_id, $d AS dist_raw,
           |         row_number() OVER (PARTITION BY p.probe_id
           |           ORDER BY $d ASC, CAST(e.vec_id AS VARCHAR) ASC) AS rnk
           |  FROM embeddings e CROSS JOIN probes p)
           |SELECT probe_id, CAST(rnk AS INT) AS rn,
           |       CAST(vec_id AS VARCHAR) AS id,
           |       'doc for vector ' || vec_id AS doc,
           |       round(dist_raw, 6) AS dist
           |FROM scored WHERE rnk <= 5
           |ORDER BY probe_id, rn""".stripMargin
      }),

    Q(
      "q_encrypt_search",
      "encrypted cell-pruned ANN: storeIndexed + full-probe queryIndexed == exact kNN",
      (s, dir) => {
        val base = graft.store.Scratch.dir("graft_encidx")
        val enc = new EncryptedStore(s, base, TestKey)
        val rows = tbl(s, dir, "embeddings")
          .select(col("vec_id").cast("string").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        enc.storeIndexed(rows, "vectors", numCells = 8)
        val qe = tbl(s, dir, "embeddings").filter(col("vec_id") === 17)
          .head().getAs[Seq[Float]]("embedding").toArray
        enc.queryIndexed("vectors", qe, k = 5, nprobe = 8)
          .select(col("id"), col("doc"), round(col("distance"), 6).as("dist"))
      },
      Some {
        val dist = OracleSql.l2Sq("e.embedding", "probe.qe")
        s"""WITH probe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 17)
           |SELECT CAST(e.vec_id AS VARCHAR) AS id,
           |       'doc for vector ' || e.vec_id AS doc,
           |       round($dist, 6) AS dist
           |FROM embeddings e CROSS JOIN probe
           |ORDER BY $dist ASC, CAST(e.vec_id AS VARCHAR) ASC LIMIT 5""".stripMargin
      }),

    // Graph serving over an AES-GCM encrypted corpus (r13): q_ann_graph_
    // search's exact recipe — same 2-table LSH kNN graph, same beam/hops/
    // entries — but the corpus is CIPHERTEXT at rest and the shared walk
    // ([[graft.store.GraphWalk]]) decrypts only the frontier's fresh nodes
    // per hop plus the k answer docs. The oracle replays the identical
    // build+walk from plaintext (the recursive-CTE walk), so the hash
    // equality proves the encrypted walk changes WHERE the bytes live,
    // never the answer — the reference's defense motive
    // (/root/reference/src/cyborgdb_store.py:1-2) on the graph family.
    Q(
      "q_encrypt_graph",
      "beam search over an AES-GCM encrypted corpus: per-hop bounded decrypts, plaintext-walk answers",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val corpus = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        val qe: Array[Float] = e.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        val eg = new graft.store.EncryptedGraph(
          s, graft.store.Scratch.dir("graft_encg"), TestKey)
        eg.build(corpus, k = 4,
          Seq(AnnQueries.lshBucketFn(0), AnnQueries.lshBucketFn(200)),
          refineRounds = 0)
        eg.queryBatch(Seq(0L -> qe), topK = 5, beamWidth = 4, hops = 3,
            entries = Seq(1L, 2L), includeDoc = true)
          .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"),
            col("doc"))
          .orderBy(asc("dist"), asc("vec_id"))
      },
      Some(encGraphOracleSql)),

    // The SAME encrypted walk with the probe as a FRAME (r14):
    // EncryptedGraph.queryBatchDF — the shared GraphWalk.batchDF schedule
    // over decrypt-on-read vectors, per-hop decrypts bounded by an id
    // semi-join below the decrypt projection. The oracle is
    // q_encrypt_graph's VERBATIM, so a hash match on both proves the
    // frame route serves the Seq route's exact answers.
    Q(
      "q_encrypt_graph_df",
      "frame-probe beam search over an AES-GCM encrypted corpus: shared frame walk, semi-join-bounded decrypts",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val corpus = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("id"),
            concat(lit("doc for vector "), col("vec_id")).as("doc"),
            col("embedding").as("emb"))
        val eg = new graft.store.EncryptedGraph(
          s, graft.store.Scratch.dir("graft_encg_df"), TestKey)
        eg.build(corpus, k = 4,
          Seq(AnnQueries.lshBucketFn(0), AnnQueries.lshBucketFn(200)),
          refineRounds = 0)
        val panelDf = e.filter(col("vec_id") === 0)
          .select(lit(0L).as("probe_id"), col("embedding").as("qe"))
        eg.queryBatchDF(panelDf, topK = 5, beamWidth = 4, hops = 3,
            entries = Seq(1L, 2L), includeDoc = true)
          .select(col("id").as("vec_id"), round(col("dist"), 6).as("dist"),
            col("doc"))
          .orderBy(asc("dist"), asc("vec_id"))
      },
      Some(encGraphOracleSql))
  )
}
