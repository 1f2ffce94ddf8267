package graft.queries

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/**
 * Data-quality MONITORING — the production-pipeline family the query suite
 * lacked: an ingest that runs for months must detect when the data shifts
 * under it (a crawler source changes, an embedder is retrained, a locale
 * floods in) BEFORE the shift poisons training. Both monitors compare a
 * REFERENCE slice against a PRODUCTION slice of the same table — here the
 * deterministic even/odd split, in production "last good snapshot" vs
 * "this week's ingest" (the snapshot surface, `Collection.snapshot`,
 * provides exactly that frozen reference).
 *
 * Scale design: both monitors are one aggregation each over narrow frames —
 * per-dimension moment sums (64·2 groups) and per-token counts
 * (vocabulary-sized, heavy-hitter-bounded) — shuffles carry group keys,
 * never rows. At 100 TB either runs as a cheap side-output of the ingest
 * scan. Determinism: moments round to 4 digits (distributed double sums),
 * PSI ranks on its 6-digit rounding so a 1-ulp ln() divergence can never
 * flip an answer (the q_keywords discipline).
 */
object MonitorQueries {
  import Registry.tbl

  val all: Seq[Q] = Seq(

    // Per-dimension embedding drift: |mean shift| in reference-std units
    // (the z-scored mean-shift monitor every embedding pipeline runs).
    // One posexplode + one (d, side) aggregation; top-10 drifted dims.
    Q(
      "q_embedding_drift",
      "per-dimension embedding mean-shift monitor (reference vs production slice)",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .withColumn("side", (col("vec_id") % 2 === 0).cast("int"))
          .select(col("side"), posexplode(col("embedding")).as(Seq("d", "x")))
          .groupBy("d").agg(
            sum(when(col("side") === 1, col("x").cast("double"))).as("s_r"),
            sum(when(col("side") === 1, col("x").cast("double") * col("x").cast("double"))).as("q_r"),
            count(when(col("side") === 1, lit(1))).as("n_r"),
            sum(when(col("side") === 0, col("x").cast("double"))).as("s_p"),
            count(when(col("side") === 0, lit(1))).as("n_p"))
        e.select(col("d"),
            (col("s_r") / col("n_r")).as("mean_ref"),
            (col("s_p") / col("n_p")).as("mean_prod"),
            // clamp before sqrt: for a near-constant dimension catastrophic
            // cancellation can push the variance fractionally negative —
            // Spark would return NaN while DuckDB's sqrt raises out-of-range,
            // so the oracle replay would hard-fail instead of hash-matching
            sqrt(greatest(lit(0.0), (col("q_r") / col("n_r")) -
              (col("s_r") / col("n_r")) * (col("s_r") / col("n_r")))).as("std_ref"))
          .select(col("d"),
            round(col("mean_ref"), 4).as("mean_ref"),
            round(col("mean_prod"), 4).as("mean_prod"),
            round(abs(col("mean_prod") - col("mean_ref")) / (col("std_ref") + lit(1e-9)), 4)
              .as("drift"))
          .orderBy(desc("drift"), asc("d"))
          .limit(10)
      },
      Some {
        s"""WITH x AS (
           |  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS side,
           |         unnest(range(1, ${AnnQueries.EmbDim + 1})) AS di, embedding
           |  FROM embeddings),
           |v AS (SELECT side, CAST(di AS INT) - 1 AS dz,
           |             CAST(embedding[CAST(di AS INT)] AS DOUBLE) AS xv FROM x),
           |agg AS (
           |  SELECT dz,
           |         sum(CASE WHEN side = 1 THEN xv END) AS s_r,
           |         sum(CASE WHEN side = 1 THEN xv * xv END) AS q_r,
           |         count(CASE WHEN side = 1 THEN 1 END) AS n_r,
           |         sum(CASE WHEN side = 0 THEN xv END) AS s_p,
           |         count(CASE WHEN side = 0 THEN 1 END) AS n_p
           |  FROM v GROUP BY dz),
           |m AS (SELECT dz, s_r / n_r AS mean_ref, s_p / n_p AS mean_prod,
           |             sqrt(greatest(0.0, q_r / n_r - (s_r / n_r) * (s_r / n_r))) AS std_ref
           |      FROM agg)
           |SELECT CAST(dz AS INT) AS d, round(mean_ref, 4) AS mean_ref,
           |       round(mean_prod, 4) AS mean_prod,
           |       round(abs(mean_prod - mean_ref) / (std_ref + 1e-9), 4) AS drift
           |FROM m ORDER BY drift DESC, d LIMIT 10""".stripMargin
      }),

    // Token-distribution drift (PSI — population stability index, the
    // standard categorical-shift monitor): add-one-smoothed frequencies
    // over the reference slice's top-200 tokens, per-token contribution
    // (p - q)·ln(p/q), report the 15 worst tokens. Counts are exact
    // integers; only the final PSI touches libm, and ranking goes through
    // its 6-digit rounding.
    Q(
      "q_token_drift",
      "token-distribution PSI monitor over the reference top-200 vocabulary",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("side", (col("doc_id") % 2 === 0).cast("int"))
          .select(col("side"), explode(TF.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(
            count(when(col("side") === 1, lit(1))).as("c_r"),
            count(when(col("side") === 0, lit(1))).as("c_p"))
          .persist()
        val totals = docs.agg(sum("c_r"), sum("c_p")).head()
        val (tr, tp) = (totals.getLong(0), totals.getLong(1))
        // the REFERENCE vocabulary only (c_r > 0): a production-only token
        // is not part of the frozen vocabulary psiOf scores, so it must
        // neither enter the scored set nor inflate the smoothing k —
        // otherwise batch and streaming twin diverge exactly when a flood
        // introduces new tokens (the case the monitor exists for)
        val top = docs.filter(col("c_r") > 0)
          .orderBy(desc("c_r"), asc("tok")).limit(200)
        // smoothing denominator k = the ACTUAL reference-vocabulary size
        // (≤ 200), not the hard-coded limit: StreamOps.psiOf smooths with
        // refVocab.size, and the documented "identical numbers given
        // identical counts" contract with the streaming twin needs batch
        // and stream to share one k even when the reference slice has
        // fewer than 200 distinct tokens
        val k = lit(top.count().toDouble)
        val p = (col("c_r").cast("double") + 1.0) / (lit(tr.toDouble) + k)
        val q = (col("c_p").cast("double") + 1.0) / (lit(tp.toDouble) + k)
        Registry.freeAfter(
          top.select(col("tok"), col("c_r"), col("c_p"),
              round((p - q) * log(p / q), 6).as("psi"))
            .orderBy(desc("psi"), asc("tok"))
            .limit(15),
          docs)
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS (
           |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS side,
           |         unnest($toks) AS tok
           |  FROM documents),
           |c AS MATERIALIZED (
           |  SELECT tok,
           |         CAST(count(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS c_r,
           |         CAST(count(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS c_p
           |  FROM t GROUP BY tok),
           |tot AS (SELECT CAST(sum(c_r) AS DOUBLE) AS tr, CAST(sum(c_p) AS DOUBLE) AS tp FROM c),
           |top AS MATERIALIZED (SELECT tok, c_r, c_p FROM c WHERE c_r > 0 ORDER BY c_r DESC, tok LIMIT 200),
           |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM top),
           |s AS (SELECT tok, c_r, c_p,
           |             (CAST(c_r AS DOUBLE) + 1.0) / (tot.tr + kk.k) AS p,
           |             (CAST(c_p AS DOUBLE) + 1.0) / (tot.tp + kk.k) AS q
           |      FROM top CROSS JOIN tot CROSS JOIN kk)
           |SELECT tok, c_r, c_p, round((p - q) * ln(p / q), 6) AS psi
           |FROM s ORDER BY psi DESC, tok LIMIT 15""".stripMargin
      })
  )
}
