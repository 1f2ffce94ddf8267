package graft.queries

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vector-workload queries — reference parity for the kNN / extraction surface
 * (SURVEY.md §2.1-§2.6: S4-S6, P1-P3, J1, W1, A1-A4, O1-O3).
 *
 * Scale notes (100 TB design point): the query side of every kNN is tiny and
 * explicitly `broadcast()`; the corpus side streams through one narrow pass
 * (scan → score → per-partition top-k via TakeOrderedAndProject). The grouped
 * variants shuffle only (group_key, k) rows after partial aggregation.
 */
object VectorQueries {
  import Registry.tbl

  /** Probe = stored vector of vec_id 0 (mirrors /root/reference/src/cod.py:108
    * querying the store with one of its own vectors, the "leak" demo). */
  private def probe(spark: org.apache.spark.sql.SparkSession, dir: String) =
    tbl(spark, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))

  private val oracleProbe = "SELECT embedding AS qe FROM embeddings WHERE vec_id = 0"

  val all: Seq[Q] = Seq(

    // J1/O1-O3/F1: single-probe kNN by cosine — reference src/cod.py:123-139
    // with the attack's metric (src/app.py:52-59). Plan: broadcast nested-loop
    // join + TakeOrderedAndProject (no shuffle of the corpus).
    Q(
      "q_knn_cosine",
      "top-3 nearest stored vectors to a probe vector, cosine similarity",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        e.crossJoin(broadcast(probe(s, dir)))
          .withColumn("sim_raw", VF.cosine(col("embedding"), col("qe")))
          .orderBy(desc("sim_raw"), asc("vec_id"))
          .limit(3)
          .select(col("vec_id"), round(col("sim_raw"), 6).as("sim"))
      },
      Some(s"""WITH q AS ($oracleProbe)
              |SELECT e.vec_id, round(${OracleSql.cosine("e.embedding", "q.qe")}, 6) AS sim
              |FROM embeddings e CROSS JOIN q
              |ORDER BY ${OracleSql.cosine("e.embedding", "q.qe")} DESC, e.vec_id
              |LIMIT 3""".stripMargin)),

    // F2: same probe, squared-L2 — the store's own metric (Chroma default).
    Q(
      "q_knn_l2",
      "top-3 nearest stored vectors to a probe vector, squared L2",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        e.crossJoin(broadcast(probe(s, dir)))
          .withColumn("dist_raw", VF.l2Sq(col("embedding"), col("qe")))
          .orderBy(asc("dist_raw"), asc("vec_id"))
          .limit(3)
          .select(col("vec_id"), round(col("dist_raw"), 6).as("dist"))
      },
      Some(s"""WITH q AS ($oracleProbe)
              |SELECT e.vec_id, round(${OracleSql.l2Sq("e.embedding", "q.qe")}, 6) AS dist
              |FROM embeddings e CROSS JOIN q
              |ORDER BY ${OracleSql.l2Sq("e.embedding", "q.qe")} ASC, e.vec_id
              |LIMIT 3""".stripMargin)),

    // J1 general form: K probes × N corpus, top-3 each (src/cod.py:125-129
    // supports a batch of query_embeddings). Window over the broadcast join.
    Q(
      "q_knn_multiprobe",
      "top-3 neighbors for each of 5 probe vectors (batch kNN)",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("qe"))
        val w = Window.partitionBy("probe_id").orderBy(asc("dist_raw"), asc("vec_id"))
        e.crossJoin(broadcast(probes))
          .withColumn("dist_raw", VF.l2Sq(col("embedding"), col("qe")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("probe_id"), col("rnk"), col("vec_id"), round(col("dist_raw"), 6).as("dist"))
          .orderBy("probe_id", "rnk")
      },
      Some(s"""WITH probes AS (SELECT vec_id AS probe_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
              |scored AS (
              |  SELECT p.probe_id, e.vec_id, ${OracleSql.l2Sq("e.embedding", "p.qe")} AS dist_raw,
              |         row_number() OVER (PARTITION BY p.probe_id ORDER BY ${OracleSql.l2Sq("e.embedding", "p.qe")} ASC, e.vec_id) AS rnk
              |  FROM embeddings e CROSS JOIN probes p)
              |SELECT probe_id, rnk, vec_id, round(dist_raw, 6) AS dist
              |FROM scored WHERE rnk <= 3
              |ORDER BY probe_id, rnk""".stripMargin)),

    // W1 grouped: top-2 per label group — grouped top-k at scale (partial
    // per-partition top-k before the shuffle would be the 100TB refinement).
    Q(
      "q_knn_grouped",
      "top-2 nearest to probe within each label group",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val w = Window.partitionBy("label").orderBy(asc("dist_raw"), asc("vec_id"))
        e.crossJoin(broadcast(probe(s, dir)))
          .withColumn("dist_raw", VF.l2Sq(col("embedding"), col("qe")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .select(col("label"), col("rnk"), col("vec_id"), round(col("dist_raw"), 6).as("dist"))
          .orderBy("label", "rnk")
      },
      Some(s"""WITH q AS ($oracleProbe),
              |scored AS (
              |  SELECT e.label, e.vec_id, ${OracleSql.l2Sq("e.embedding", "q.qe")} AS dist_raw,
              |         row_number() OVER (PARTITION BY e.label ORDER BY ${OracleSql.l2Sq("e.embedding", "q.qe")} ASC, e.vec_id) AS rnk
              |  FROM embeddings e CROSS JOIN q)
              |SELECT label, rnk, vec_id, round(dist_raw, 6) AS dist
              |FROM scored WHERE rnk <= 2
              |ORDER BY label, rnk""".stripMargin)),

    // A3/P6: global best score — the attack loop's per-generation driver probe
    // (src/app.py:136-147). One partial-agg pass, no shuffle of rows.
    Q(
      "q_best_score",
      "global max cosine similarity to probe + count (early-stop probe)",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        e.crossJoin(broadcast(probe(s, dir)))
          .withColumn("sim_raw", VF.cosine(col("embedding"), col("qe")))
          .agg(round(max("sim_raw"), 6).as("best_sim"), count(lit(1)).as("n"))
      },
      Some(s"""WITH q AS ($oracleProbe)
              |SELECT round(max(${OracleSql.cosine("e.embedding", "q.qe")}), 6) AS best_sim,
              |       CAST(count(*) AS BIGINT) AS n
              |FROM embeddings e CROSS JOIN q""".stripMargin)),

    // P1/P3: include-projection full extraction — the "leak" premise
    // (src/chromadb_store.py:10-12): plaintext store is fully scannable.
    // Column pruning means only (vec_id, embedding-derived) bytes are read.
    Q(
      "q_extract_all",
      "full-scan extraction with include-projection (ids + vector norms)",
      (s, dir) =>
        tbl(s, dir, "embeddings")
          .select(col("vec_id"), round(VF.norm(col("embedding")), 6).as("nrm"))
          .orderBy("vec_id"),
      Some(s"""SELECT vec_id, round(sqrt(${OracleSql.normSq("embedding")}), 6) AS nrm
              |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // P2: point lookup by id list (src/cod.py:108) — predicate pushed to
    // parquet row-group stats; at scale the store is bucketed by id.
    Q(
      "q_point_get",
      "point lookup by id list with projection",
      (s, dir) =>
        tbl(s, dir, "documents")
          .filter(col("doc_id").isin(3L, 7L, 11L))
          .select(col("doc_id"), col("text"), col("source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, text, source FROM documents
             |WHERE doc_id IN (3, 7, 11) ORDER BY doc_id""".stripMargin)),

    // P4/F8/S1: corpus scan with per-row trim (src/main.py:6-9).
    Q(
      "q_corpus_scan",
      "document scan with trim + length projection",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), trim(col("text")).as("doc"),
            length(trim(col("text"))).as("len"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, trim(text) AS doc, CAST(length(trim(text)) AS INT) AS len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // A2: dedup-keep-max — the attack's final dedup (src/app.py:246-250),
    // expressed over stored vectors: per label keep the best-scoring id.
    // Map-side partial max → tiny shuffle (one row per key).
    Q(
      "q_dedup_max",
      "per-key max score with keeper id (dedup keep-best)",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val scored = e.crossJoin(broadcast(probe(s, dir)))
          .withColumn("sim_raw", VF.cosine(col("embedding"), col("qe")))
        scored.groupBy("label")
          .agg(round(max("sim_raw"), 6).as("best_sim"),
            max(struct(col("sim_raw"), col("vec_id"))).getField("vec_id").as("best_id"),
            count(lit(1)).as("n"))
          .orderBy("label")
      },
      Some(s"""WITH q AS ($oracleProbe),
              |scored AS (SELECT e.label, e.vec_id, ${OracleSql.cosine("e.embedding", "q.qe")} AS sim_raw
              |           FROM embeddings e CROSS JOIN q),
              |ranked AS (
              |  SELECT label, sim_raw, vec_id,
              |         row_number() OVER (PARTITION BY label ORDER BY sim_raw DESC, vec_id DESC) AS rn,
              |         max(sim_raw) OVER (PARTITION BY label) AS sim_best,
              |         count(*) OVER (PARTITION BY label) AS n
              |  FROM scored)
              |SELECT label, round(sim_best, 6) AS best_sim, vec_id AS best_id, n
              |FROM ranked WHERE rn = 1 ORDER BY label""".stripMargin)),

    // U1 + A2: union of two strategies' results, then dedup-keep-max
    // (src/app.py:234-250). UNION ALL then hash-agg.
    Q(
      "q_union_dedup",
      "union two scored result sets, dedup by key keeping max",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
        val scored = e.crossJoin(broadcast(probe(s, dir)))
        val a = scored.select(col("vec_id"),
          VF.cosine(col("embedding"), col("qe")).as("score"))
        val b = scored.select(col("vec_id"),
          (VF.dot(col("embedding"), col("qe")) / lit(100.0)).as("score"))
        a.unionByName(b)
          .groupBy("vec_id").agg(round(max("score"), 6).as("best"))
          .orderBy("vec_id")
      },
      Some(s"""WITH q AS ($oracleProbe),
              |u AS (
              |  SELECT e.vec_id, ${OracleSql.cosine("e.embedding", "q.qe")} AS score FROM embeddings e CROSS JOIN q
              |  UNION ALL
              |  SELECT e.vec_id, ${OracleSql.dot("e.embedding", "q.qe")} / 100.0 AS score FROM embeddings e CROSS JOIN q)
              |SELECT vec_id, round(max(score), 6) AS best FROM u GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // F10: prompt assembly — ordered string agg of neighbor docs
    // (src/cod.py:148-159). collect_list bounded by k=3 per group.
    Q(
      "q_prompt_assembly",
      "per-language ordered concatenation of top document snippets",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        d.filter(col("doc_id") < 50)
          .select(col("lang"), substring(col("text"), 1, 20).as("snip"))
          .groupBy("lang")
          .agg(array_join(array_sort(collect_list("snip")), " | ").as("prompt"))
          .orderBy("lang")
      },
      Some("""SELECT lang, string_agg(snip, ' | ' ORDER BY snip) AS prompt
             |FROM (SELECT lang, substr(text, 1, 20) AS snip FROM documents WHERE doc_id < 50)
             |GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
