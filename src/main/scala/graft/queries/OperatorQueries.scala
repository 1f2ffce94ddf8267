package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.multimodal.MultimodalOps
import graft.operators.{AsOfJoin, GroupedTopK}
import org.apache.spark.sql.functions._

/**
 * Composite-operator queries: as-of join (point-in-time lookup) and the
 * multimodal binary feature pipeline — both oracle-checked.
 */
object OperatorQueries {

  val all: Seq[Q] = Seq(

    // As-of join: for each purchase, the user's most recent click at or
    // before it. Spark side is union+window (one shuffle, one sort);
    // oracle uses DuckDB's native ASOF LEFT JOIN.
    Q(
      "q_asof_join",
      "as-of join: latest click at-or-before each purchase per user",
      (s, dir) => {
        val ev = EventsTable.load(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("tsu"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"))
        AsOfJoin.asOf(purchases, clicks, "user_id", "tsu", Seq("tsu" -> "click_tsu"))
          .select(col("event_id"), col("user_id"),
            (col("tsu") - col("click_tsu")).as("lag_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type FROM events),
             |l AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'purchase'),
             |r AS (SELECT user_id, tsu FROM e WHERE event_type = 'click')
             |SELECT l.event_id, l.user_id, l.tsu - r.tsu AS lag_us
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsu >= r.tsu
             |ORDER BY l.event_id""".stripMargin)),

    // Grouped top-k via a typed Aggregator: identical semantics to the
    // window formulation (q_knn_grouped) but with MAP-SIDE partial top-k —
    // the shuffle carries at most k rows per (group, task) instead of the
    // whole corpus. Same oracle shape as q_knn_grouped.
    Q(
      "q_topk_agg",
      "grouped top-2 nearest to probe via bounded-buffer aggregator",
      (s, dir) => {
        val e = Registry.tbl(s, dir, "embeddings")
        val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        e.crossJoin(broadcast(probe))
          .withColumn("dist_raw", VF.l2Sq(col("embedding"), col("qe")))
          .groupBy("label")
          .agg(GroupedTopK.topK(2)(col("dist_raw"), col("vec_id")).as("topk"))
          .select(col("label"), posexplode(col("topk")).as(Seq("pos", "s")))
          .select(col("label"), (col("pos") + 1).as("rnk"),
            col("s.id").as("vec_id"), round(col("s.score"), 6).as("dist"))
          .orderBy("label", "rnk")
      },
      Some {
        val d = OracleSql.l2Sq("e.embedding", "q.qe")
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT e.label, e.vec_id, $d AS dist_raw,
           |         row_number() OVER (PARTITION BY e.label ORDER BY $d ASC, e.vec_id) AS rnk
           |  FROM embeddings e CROSS JOIN q)
           |SELECT label, CAST(rnk AS INT) AS rnk, vec_id, round(dist_raw, 6) AS dist
           |FROM scored WHERE rnk <= 2
           |ORDER BY label, rnk""".stripMargin
      }),

    // KMV (k-minimum-values) distinct-count sketch: a DETERMINISTIC sketch
    // (unlike HLL) — estimate = (k-1) * P / h_k where h_k is the k-th
    // smallest distinct hash. The k-smallest set is exactly the GroupedTopK
    // bounded-buffer aggregate, so the sketch gets map-side partials for
    // free and shuffles k values per group-task. The oracle recomputes the
    // identical integer/double math, so even the ESTIMATE hash-matches.
    Q(
      "q_sketch_distinct",
      "KMV distinct-token sketch per language vs exact count",
      (s, dir) => {
        val k = 64
        val d = Registry.tbl(s, dir, "documents")
          .select(col("lang"), TF.tokens(col("text")).as("toks"))
          .select(col("lang"), explode(col("toks")).as("tok"))
          .select(col("lang"), graft.functions.TextFunctions.polyHash(col("tok")).as("h"))
          .distinct()
        d.groupBy("lang")
          .agg(count(lit(1)).as("exact_distinct"),
            GroupedTopK.topK(k)(col("h").cast("double"), col("h")).as("mins"))
          .select(col("lang"), col("exact_distinct"),
            round(when(col("exact_distinct") < k, col("exact_distinct").cast("double"))
              .otherwise(lit((k - 1).toDouble * graft.functions.TextHashOps.P) /
                element_at(col("mins"), k).getField("score")), 2).as("kmv_estimate"))
          .orderBy("lang")
      },
      Some {
        val k = 64
        val th = OracleText.tokenHashes(OracleText.tokens("text"))
        s"""WITH t AS (SELECT lang, unnest($th) AS h FROM documents),
           |d AS (SELECT DISTINCT lang, h FROM t),
           |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
           |             count(*) OVER (PARTITION BY lang) AS nd FROM d)
           |SELECT lang, CAST(any_value(nd) AS BIGINT) AS exact_distinct,
           |  round(CASE WHEN any_value(nd) < $k THEN CAST(any_value(nd) AS DOUBLE)
           |        ELSE ${(k - 1).toDouble} * ${graft.functions.TextHashOps.P} / CAST(max(CASE WHEN rn = $k THEN h END) AS DOUBLE) END, 2) AS kmv_estimate
           |FROM r GROUP BY lang ORDER BY lang""".stripMargin
      }),

    // Exact interpolated quantiles (percentile == DuckDB quantile_cont).
    Q(
      "q_quantiles",
      "exact interpolated quantiles of quantity per returnflag",
      (s, dir) =>
        Registry.tbl(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
             |  round(quantile_cont(l_quantity, 0.95), 4) AS p95,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Multimodal plumbing: text bytes as an opaque BINARY payload, batched
    // stub decode via mapPartitions, typed feature schema. The oracle
    // recomputes the stub's deterministic features from the source text
    // (payloads are ASCII, so bytes == code points).
    Q(
      "q_multimodal_features",
      "binary media payload -> batched stub decode -> typed features",
      (s, dir) => {
        import s.implicits._
        val payloads = Registry.tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
        MultimodalOps.extractImageFeatures(payloads)
          .toDF()
          .orderBy("doc_id")
      },
      Some {
        val ck = OracleText.polyHash("text")
        s"""WITH f AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           |                  $ck AS checksum FROM documents)
           |SELECT doc_id, n_bytes, checksum,
           |       CAST(checksum % 640 + 1 AS INT) AS width,
           |       CAST(checksum % 480 + 1 AS INT) AS height
           |FROM f ORDER BY doc_id""".stripMargin
      }),

    // Video-frame sampling: payload = sequence of 32-byte frames; emit
    // every 2nd frame, max 4 per doc, fingerprint each frame. The frame
    // EXTRACTION is a narrow codegen explode (no UDF); the fixture payload
    // is the UTF-8 text so the oracle re-slices with substr (ASCII: byte
    // offsets == char offsets).
    Q(
      "q_multimodal_frames",
      "frame sampling: every-2nd 32-byte frame (max 4), per-frame fingerprint",
      (s, dir) => {
        val media = Registry.tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        MultimodalOps.sampleFrames(media, "doc_id", "payload",
            frameSize = 32, stride = 2, maxFrames = 4)
          .select(col("doc_id"), col("frame_idx"), col("frame_offset"),
            TF.polyHash(decode(col("frame"), "UTF-8")).as("frame_fp"))
          .orderBy("doc_id", "frame_idx")
      },
      Some {
        val fp = OracleText.polyHash("substr(text, frame_offset + 1, 32)")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    unnest(CASE WHEN least(CAST(floor(length(text) / 32) AS INT), 7) <= 0 THEN []
           |      ELSE range(0, least(CAST(floor(length(text) / 32) AS INT), 7), 2) END) AS frame_idx
           |  FROM documents),
           |o AS (SELECT f.doc_id, f.frame_idx, f.frame_idx * 32 AS frame_offset
           |      FROM f)
           |SELECT o.doc_id, CAST(o.frame_idx AS INT) AS frame_idx,
           |       CAST(o.frame_offset AS INT) AS frame_offset,
           |       $fp AS frame_fp
           |FROM o JOIN documents USING (doc_id)
           |ORDER BY doc_id, frame_idx""".stripMargin
      }),

    // Cross-modal retrieval — the CLIP serving shape: an image tower maps
    // each binary payload into the TEXT embedding space (aHash signature
    // → formulaic dyadic projection, one codegen scan — a real deployment
    // swaps trained weights into the same plan), then relational top-k
    // against the text embeddings. The probe side pairs via ProbeJoin
    // (broadcast while small, chunked CartesianProduct once the
    // corpus-fraction probe set outgrows the broadcast limit); the corpus
    // side never shuffles either way. Every arithmetic step is exact
    // (integer projection numerators, dyadic /4, in-order double dot), so
    // the oracle replays image tower + retrieval bit-for-bit. At 100 TB
    // the brute scan swaps for the attached IVF/graph index route
    // (q_ann_*); the tower and ranking stay as-is.
    Q(
      "q_crossmodal",
      "cross-modal retrieval: image payloads -> shared space -> top-3 texts each",
      (s, dir) => {
        val probes = Registry.tbl(s, dir, "documents")
          .filter(col("doc_id") % 50 === 1)
          .select(col("doc_id").as("img_id"),
            TF.crossProj(TF.aHashBands(encode(col("text"), "UTF-8"))).as("nums"))
          // quarters with |x| <= 48 — exact in FLOAT, so the codegen
          // DotProduct kernel (double accumulation, index order) computes
          // the same bits as the oracle's in-order double fold
          .withColumn("sh",
            transform(col("nums"), n => (n.cast("double") / 4.0).cast("float")))
          .select("img_id", "sh")
          // persisted: ProbeJoin's routing count and the join both
          // evaluate the image tower — one pass, not two
          .persist()
        val scored = graft.operators.ProbeJoin
          .cross(Registry.tbl(s, dir, "embeddings"), probes)
          .withColumn("score_raw", VF.dot(col("sh"), col("embedding")))
        // shuffle the ANSWER, not the corpus: map-side bounded top-k per
        // image (GroupedTopK over the NEGATED score — (-score, id) asc ==
        // (score desc, id asc); double negation is bit-exact), so the
        // exchange carries k x images x tasks rows instead of N x images
        Registry.releaseLater(
          scored.groupBy("img_id")
            .agg(GroupedTopK.topK(3)(negate(col("score_raw")), col("vec_id")).as("topk"))
            .select(col("img_id"), posexplode(col("topk")).as(Seq("pos", "s")))
            .select(col("img_id"), (col("pos") + 1).cast("int").as("rn"),
              col("s.id").as("vec_id"), round(-col("s.score"), 6).as("score"))
            .orderBy("img_id", "rn"),
          probes)
      },
      Some(
        """WITH imgs AS (SELECT doc_id AS img_id, text FROM documents WHERE doc_id % 50 = 1),
          |hx AS MATERIALIZED (
          |  SELECT img_id, hex(encode(text)) AS h, CAST(strlen(text) AS BIGINT) AS n
          |  FROM imgs),
          |pos AS (SELECT img_id, unnest(range(0, n)) AS i FROM hx),
          |b AS (SELECT p.img_id, CAST(p.i AS BIGINT) AS i,
          |        CAST(16 * (strpos('0123456789ABCDEF',
          |                          substr(m.h, CAST(2 * p.i + 1 AS INT), 1)) - 1)
          |                + (strpos('0123456789ABCDEF',
          |                          substr(m.h, CAST(2 * p.i + 2 AS INT), 1)) - 1)
          |             AS BIGINT) AS v,
          |        m.n
          |      FROM pos p JOIN hx m USING (img_id)),
          |cells AS (SELECT img_id, n, (i * 64) // n AS cell,
          |                 sum(v) AS cs, CAST(count(*) AS BIGINT) AS cc
          |          FROM b GROUP BY img_id, n, (i * 64) // n),
          |tot AS (SELECT img_id, sum(cs) AS ts FROM cells GROUP BY img_id),
          |bits AS (SELECT c.img_id, CAST(c.cell AS BIGINT) AS j,
          |                CASE WHEN c.cs * c.n > t.ts * c.cc THEN 1 ELSE -1 END AS f
          |         FROM cells c JOIN tot t USING (img_id)),
          |spine AS (SELECT img_id, CAST(unnest(range(0, 64)) AS BIGINT) AS j FROM imgs),
          |feats AS (SELECT s.img_id, s.j, CAST(coalesce(b2.f, -1) AS BIGINT) AS f
          |          FROM spine s LEFT JOIN bits b2 ON b2.img_id = s.img_id AND b2.j = s.j),
          |dims AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS i),
          |nums AS (SELECT f2.img_id, d.i,
          |                sum(f2.f * (((d.i * 131 + f2.j * 17) % 7) - 3)) AS num
          |         FROM feats f2, dims d GROUP BY f2.img_id, d.i),
          |sh AS (SELECT img_id, list(num / 4.0 ORDER BY i) AS sh FROM nums GROUP BY img_id),
          |sc AS (SELECT s2.img_id, e.vec_id,
          |              list_reduce(list_transform(range(1, 65),
          |                i -> s2.sh[i] * CAST(e.embedding[i] AS DOUBLE)),
          |                (x, y) -> x + y) AS score_raw
          |       FROM sh s2 CROSS JOIN embeddings e),
          |rk AS (SELECT img_id, vec_id, score_raw,
          |              row_number() OVER (PARTITION BY img_id
          |                                 ORDER BY score_raw DESC, vec_id) AS rn
          |       FROM sc)
          |SELECT img_id, CAST(rn AS INT) AS rn, vec_id, round(score_raw, 6) AS score
          |FROM rk WHERE rn <= 3 ORDER BY img_id, rn""".stripMargin)),

    // Resize planning: stub-decoded dims fit into a 224x224 box preserving
    // aspect ratio (the vision-encoder normalization step). All IEEE-double
    // min/floor math, so the oracle recomputes it exactly from the
    // checksum-derived stub dimensions.
    Q(
      "q_multimodal_resize",
      "aspect-preserving resize plan into a 224x224 box per image",
      (s, dir) => {
        import s.implicits._
        val payloads = Registry.tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
        MultimodalOps.resizePlan(payloads, box = 224)
          .toDF()
          .select(col("doc_id"), col("width"), col("height"),
            col("out_w"), col("out_h"), round(col("scale"), 6).as("scale"))
          .orderBy("doc_id")
      },
      Some {
        val ck = OracleText.polyHash("text")
        s"""WITH f AS (SELECT doc_id, $ck AS checksum FROM documents),
           |d AS (SELECT doc_id,
           |        CAST(checksum % 640 + 1 AS INT) AS width,
           |        CAST(checksum % 480 + 1 AS INT) AS height
           |      FROM f),
           |p AS (SELECT doc_id, width, height,
           |        least(224.0 / width, 224.0 / height) AS scale
           |      FROM d)
           |SELECT doc_id, width, height,
           |       CAST(greatest(1, floor(width * scale)) AS INT) AS out_w,
           |       CAST(greatest(1, floor(height * scale)) AS INT) AS out_h,
           |       round(scale, 6) AS scale
           |FROM p ORDER BY doc_id""".stripMargin
      }),

    // Audio chunking: overlapping 40-byte windows at hop 20 (the STFT input
    // shape); per-chunk fingerprint + chunk count per doc. Same narrow
    // explode; only full windows are emitted.
    Q(
      "q_multimodal_audio",
      "audio chunking: 40-byte windows, hop 20, per-chunk fingerprint",
      (s, dir) => {
        val media = Registry.tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        MultimodalOps.chunkAudio(media, "doc_id", "payload", window = 40, hop = 20)
          .select(col("doc_id"), col("chunk_idx"), col("chunk_offset"),
            TF.polyHash(decode(col("chunk"), "UTF-8")).as("chunk_fp"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some {
        val fp = OracleText.polyHash("substr(text, chunk_offset + 1, 40)")
        s"""WITH n AS (
           |  SELECT doc_id,
           |    greatest(CAST(floor((length(text) - 40) / 20) AS INT) + 1, 0) AS n_chunks
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, unnest(CASE WHEN n_chunks <= 0 THEN []
           |    ELSE range(0, n_chunks) END) AS chunk_idx
           |  FROM n),
           |o AS (SELECT doc_id, chunk_idx, chunk_idx * 20 AS chunk_offset FROM c)
           |SELECT o.doc_id, CAST(o.chunk_idx AS INT) AS chunk_idx,
           |       CAST(o.chunk_offset AS INT) AS chunk_offset,
           |       $fp AS chunk_fp
           |FROM o JOIN documents USING (doc_id)
           |ORDER BY doc_id, chunk_idx""".stripMargin
      })
  )
}
