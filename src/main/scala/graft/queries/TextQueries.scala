package graft.queries

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * identification (stopword-profile heuristic), quality scoring, token
 * counting (whitespace + BPE-ish estimate), and document fingerprinting
 * (rolling polynomial hash). All run over the `documents` table; every
 * formula is mirrored exactly in DuckDB SQL via [[OracleText]].
 *
 * Scale notes: each query is one narrow scan — per-row expressions only, no
 * shuffle except the final presentation sort. At 100 TB these run as a single
 * pass with full column pruning (only `doc_id`/`text` read).
 */
object TextQueries {
  import Registry.tbl

  /** Stopword profiles for the language-ID heuristic — tiny per-language
    * word-gram profiles, shared verbatim with the oracle SQL. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  /** English stopwords used by the quality score. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  // Codegen stopword-hit kernel; cast back to INT to keep the output schema
  // of q_lang_id identical to the (size-based) composed form it replaced.
  private def hits(toks: Column, words: Seq[String]): Column =
    TF.countTokensIn(toks, words).cast("int")

  private def sqlHits(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** The sequence-packing pipeline over an arbitrary per-doc token-count
    * column (shared by the whitespace and BPE denominations): the global
    * running token count is the only cross-row dependency, and a naive
    * Window.orderBy(doc_id) computes it on ONE partition — a scale-killer.
    * Three-level scan instead: cumsum WITHIN id-range buckets (parallel,
    * partitioned window), bucket-prefix offsets WITHIN super-buckets of
    * 256 (another partitioned window), and only the N/65536 super-bucket
    * totals through one task (~763k rows even at 5e10 docs; the same
    * trick recurses if that tier ever dominates). Exact integer sums at
    * every tier, so the decomposition is bit-identical to the flat
    * cumsum. */
  private def packSlots(docs0: org.apache.spark.sql.DataFrame,
                        nTok: Column, ctx: Int): org.apache.spark.sql.DataFrame = {
    val bktW = 256
    import org.apache.spark.sql.expressions.Window
    val docs = docs0
      .select(col("doc_id"), nTok.cast("long").as("n_tok"))
      .withColumn("bkt", floor(col("doc_id") / bktW).cast("long"))
      .persist() // tokenized once; all cumsum tiers read the cache
    val wLocal = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIn = Window.partitionBy("sbkt").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSup = Window.orderBy("sbkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs.withColumn("lcum", sum("n_tok").over(wLocal))
    val btots = docs.groupBy("bkt").agg(sum("n_tok").as("btot"))
      .withColumn("sbkt", floor(col("bkt") / bktW).cast("long"))
    val supPre = btots.groupBy("sbkt").agg(sum("btot").as("stot"))
      .withColumn("spre", coalesce(sum("stot").over(wSup), lit(0L)))
      .select(col("sbkt"), col("spre"))
    val prefixes = btots
      .withColumn("ipre", coalesce(sum("btot").over(wIn), lit(0L)))
      .join(broadcast(supPre), "sbkt")
      .select(col("bkt"), (col("spre") + col("ipre")).as("bpre"))
    // one row per doc — lazy release (Registry.releaseLater)
    Registry.releaseLater(local.join(broadcast(prefixes), "bkt")
      .withColumn("strt", col("bpre") + col("lcum") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        expr(s"CAST(strt DIV $ctx AS BIGINT)").as("pack_id"),
        (col("strt") % ctx).as("pack_off"))
      .orderBy("doc_id"), docs)
  }

  /** [[packSlots]]'s oracle: the flat single-window cumsum (DuckDB runs at
    * verify scale). `withPrefix` is the full WITH-clause body defining a
    * CTE `t(doc_id, n_tok)` — free-form so the BPE denomination can bring
    * its recursive merge-replay CTEs. */
  private def packSqlWith(withPrefix: String, ctx: Int): String =
    s"""WITH $withPrefix,
       |c AS (SELECT doc_id, n_tok,
       |  CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
       |  FROM t)
       |SELECT doc_id, n_tok, CAST(strt // $ctx AS BIGINT) AS pack_id,
       |  CAST(strt % $ctx AS BIGINT) AS pack_off
       |FROM c ORDER BY doc_id""".stripMargin

  private def packSql(nTokSql: String, ctx: Int): String =
    packSqlWith(
      s"t AS (SELECT doc_id, CAST($nTokSql AS BIGINT) AS n_tok FROM documents)", ctx)

  /** The BPE fixture surface: documents plus one row per customer NAME —
    * the name column's ~1.5k distinct numeric words keep the vocab-scale
    * merge table ([[graft.functions.Bpe.TrainedMerges1k]]) discriminating
    * (the 31-word documents vocabulary fully collapses under 1000 rules,
    * which would make every n_bpe equal n_words and let a broken encoder
    * pass the oracle). Both engines construct the union identically — the
    * q_dedup_phash plant discipline. */
  private def bpeDocs(s: org.apache.spark.sql.SparkSession,
                      dir: String): org.apache.spark.sql.DataFrame =
    tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(tbl(s, dir, "customer")
        .select((col("c_custkey") + 5000000L).as("doc_id"),
          col("c_name").as("text")))

  private val bpeDocsSql: String =
    "SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT c_custkey + 5000000 AS doc_id, c_name AS text FROM customer"

  val all: Seq[Q] = Seq(

    // Language ID: argmax of stopword-profile hits with fixed precedence
    // (en > de > es > fr), 'und' when no profile matches.
    Q(
      "q_lang_id",
      "language identification via stopword-profile hits",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        val d = tbl(s, dir, "documents")
          .withColumn("toks", toks)
        val withHits = LangProfiles.foldLeft(d) { case (df, (lang, words)) =>
          df.withColumn(s"hits_$lang", hits(col("toks"), words))
        }
        val Seq(en, de, es, fr) = LangProfiles.map(p => col(s"hits_${p._1}"))
        withHits
          .withColumn("pred_lang",
            when(en + de + es + fr === 0, "und")
              .when(en >= de && en >= es && en >= fr, "en")
              .when(de >= es && de >= fr, "de")
              .when(es >= fr, "es")
              .otherwise("fr"))
          .select(col("doc_id"), col("lang"), col("pred_lang"),
            col("hits_en"), col("hits_de"), col("hits_es"), col("hits_fr"))
          .orderBy("doc_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        val hitCols = LangProfiles
          .map { case (lang, words) => s"${sqlHits(toks, words)} AS hits_$lang" }
          .mkString(",\n  ")
        s"""WITH h AS (SELECT doc_id, lang,
           |  $hitCols
           |FROM documents)
           |SELECT doc_id, lang,
           |  CASE WHEN hits_en + hits_de + hits_es + hits_fr = 0 THEN 'und'
           |       WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
           |       WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
           |       WHEN hits_es >= hits_fr THEN 'es'
           |       ELSE 'fr' END AS pred_lang,
           |  CAST(hits_en AS INT) AS hits_en, CAST(hits_de AS INT) AS hits_de,
           |  CAST(hits_es AS INT) AS hits_es, CAST(hits_fr AS INT) AS hits_fr
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    // Quality scoring: alphabetic ratio, stopword ratio, average token
    // length — combined into one bounded [0,1] score.
    Q(
      "q_quality_score",
      "document quality score (alpha/stopword/token-length ratios)",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        tbl(s, dir, "documents")
          .withColumn("toks", toks)
          .withColumn("n_toks", size(col("toks")))
          // shared component helpers (one-pass codegen kernels, guarded
          // divisors) — the same definitions the pipeline funnel and the
          // streaming ingest gate score with
          .withColumn("alpha_ratio", TF.alphaRatio(col("text")))
          .withColumn("stop_ratio", TF.stopRatio(col("toks"), col("n_toks"), StopEn))
          .withColumn("avg_tok_len", TF.avgTokLen(col("toks"), col("n_toks")))
          .select(col("doc_id"), col("n_toks"),
            round(col("alpha_ratio"), 4).as("alpha_ratio"),
            round(col("stop_ratio"), 4).as("stop_ratio"),
            round(col("avg_tok_len"), 4).as("avg_tok_len"),
            round(col("alpha_ratio") * 0.4 + col("stop_ratio") * 0.3 +
              least(col("avg_tok_len") / 8.0, lit(1.0)) * 0.3, 4).as("quality"))
          .orderBy("doc_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH q AS (SELECT doc_id,
           |  len($toks) AS n_toks,
           |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS alpha_ratio,
           |  CAST(${sqlHits(toks, StopEn)} AS DOUBLE) / greatest(len($toks), 1) AS stop_ratio,
           |  CAST(coalesce(list_sum(list_transform($toks, t -> CAST(length(t) AS BIGINT))), 0) AS DOUBLE)
           |    / greatest(len($toks), 1) AS avg_tok_len
           |FROM documents)
           |SELECT doc_id, CAST(n_toks AS INT) AS n_toks,
           |  round(alpha_ratio, 4) AS alpha_ratio,
           |  round(stop_ratio, 4) AS stop_ratio,
           |  round(avg_tok_len, 4) AS avg_tok_len,
           |  round(alpha_ratio * 0.4 + stop_ratio * 0.3 + least(avg_tok_len / 8.0, 1.0) * 0.3, 4) AS quality
           |FROM q ORDER BY doc_id""".stripMargin
      }),

    // MODEL-based quality filtering — the stage production pipelines run
    // after the heuristics: a linear classifier over hashed bag-of-token
    // features (fastText/CCNet shape; with log-odds weights it is exactly
    // DSIR's hashed importance ratio). The frozen QualityModel artifact is
    // QualityTrainer's output (spec retrains against drift); inference is
    // ONE codegen'd scan — BucketLogit folds the 128-entry weight table
    // over the token hashes in exact integer arithmetic, so there is no
    // shuffle, no explode, no join, and the oracle replays the entire
    // model bit-for-bit via the same literal weight list.
    Q(
      "q_quality_classifier",
      "model-based quality filter: hashed-bucket linear classifier, exact integer logits",
      (s, dir) => {
        val m = graft.functions.QualityModel
        tbl(s, dir, "documents")
          .withColumn("toks", TF.tokens(col("text")))
          .withColumn("logit",
            TF.bucketLogit(TF.tokenHashes(col("toks")),
              m.Weights.toSeq, m.Bias))
          .select(col("doc_id"), size(col("toks")).as("n_toks"), col("logit"),
            (col("logit") > 0).cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some {
        val m = graft.functions.QualityModel
        val wlist = m.Weights.map(v => s"CAST($v AS BIGINT)").mkString("[", ", ", "]")
        val hashes = OracleText.tokenHashes(OracleText.tokens("text"))
        s"""WITH lg AS (
           |  SELECT doc_id,
           |    len(${OracleText.tokens("text")}) AS n_toks,
           |    CAST(${m.Bias} AS BIGINT) + CAST(coalesce(list_sum(
           |      list_transform($hashes, h -> wl.l[CAST(h % ${m.Dim} + 1 AS INT)])), 0) AS BIGINT) AS logit
           |  FROM documents, (SELECT $wlist AS l) wl)
           |SELECT doc_id, CAST(n_toks AS INT) AS n_toks, logit,
           |  CAST(logit > 0 AS INT) AS keep
           |FROM lg ORDER BY doc_id""".stripMargin
      }),

    // Text normalization — the first stage of every training-data pipeline:
    // collapse every non-alphanumeric run to one space, trim, lowercase.
    // After the collapse the string is pure ASCII alnum + spaces, so
    // lower() is locale-independent in both engines. The Spark side runs
    // the one-pass CleanText kernel (bit-identical to the composed
    // lower∘trim∘regexp_replace the oracle states, spec-proven) — one
    // compiled char scan instead of a regex engine pass per document.
    Q(
      "q_text_clean",
      "normalize text: strip punctuation, collapse whitespace, lowercase",
      (s, dir) => {
        val clean = TF.cleanText(col("text"))
        tbl(s, dir, "documents")
          .withColumn("clean", clean)
          .select(col("doc_id"),
            length(col("clean")).as("clen"),
            when(col("clean") === "", 0)
              .otherwise(size(split(col("clean"), " "))).as("n_words"),
            substring(col("clean"), 1, 30).as("prefix"))
          .orderBy("doc_id")
      },
      Some(
        """WITH c AS (
          |  SELECT doc_id, lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS clean
          |  FROM documents)
          |SELECT doc_id, CAST(length(clean) AS INT) AS clen,
          |       CASE WHEN clean = '' THEN 0 ELSE CAST(len(string_split(clean, ' ')) AS INT) END AS n_words,
          |       substr(clean, 1, 30) AS prefix
          |FROM c ORDER BY doc_id""".stripMargin)),

    // PII redaction. The synthetic corpus carries no PII (verified: no '@',
    // no digit anywhere), so each engine injects the SAME deterministic
    // email + phone per row, then the redaction kernel — count + mask via
    // shared RE2-compatible regexes — must remove every one. `leak_free`
    // being TRUE for all rows is the property under test; counts/lengths
    // pin the exact match spans.
    Q(
      "q_pii_redact",
      "PII redaction: inject deterministic email+phone, mask, verify no leak",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
        val aug = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com tel 555-123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val red = regexp_replace(regexp_replace(aug, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
        tbl(s, dir, "documents")
          .withColumn("aug", aug).withColumn("red", red)
          .select(col("doc_id"),
            size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).as("n_email"),
            size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).as("n_phone"),
            length(col("red")).as("red_len"),
            (!col("red").contains("@") && !col("red").rlike(phoneRe)).as("leak_free"))
          .orderBy("doc_id")
      },
      Some(
        """WITH a AS (
          |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
          |    || '@mail.example.com tel 555-123-'
          |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
          |  FROM documents),
          |r AS (
          |  SELECT doc_id, aug,
          |         regexp_replace(regexp_replace(aug,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
          |  FROM a)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
          |       CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
          |       CAST(length(red) AS INT) AS red_len,
          |       (NOT contains(red, '@') AND NOT regexp_matches(red, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS leak_free
          |FROM r ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens, alphanumeric tokens, and a BPE-ish
    // subword estimate (ceil(len/4) pieces per token).
    Q(
      "q_token_count",
      "token counts: whitespace, alphanumeric, BPE-ish subword estimate",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        tbl(s, dir, "documents")
          .withColumn("toks", toks)
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("n_ws"),
            size(col("toks")).as("n_alnum"),
            TF.sumLong(transform(col("toks"),
              t => ceil(length(t).cast("double") / 4.0).cast("long"))).as("n_bpe_est"))
          .orderBy("doc_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""SELECT doc_id,
           |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_ws,
           |  CAST(len($toks) AS INT) AS n_alnum,
           |  CAST(coalesce(list_sum(list_transform($toks, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_est
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Deterministic stratified train/test split: the assignment is a pure
    // hash of (salt, doc_id) — reproducible across runs/retries, no rand(),
    // and joins/filters on the split column stay narrow. The standard
    // training-data-pipeline split operator.
    Q(
      "q_stratified_split",
      "hash-based 80/20 train/test split, counts per (lang, split)",
      (s, dir) =>
        tbl(s, dir, "documents")
          .withColumn("split",
            when(pmod(TF.polyHash(concat(lit("salt42:"), col("doc_id").cast("string"))), lit(100)) < 80, "train")
              .otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 2).as("avg_chars"))
          .orderBy("lang", "split"),
      Some {
        val h = OracleText.polyHash("('salt42:' || CAST(doc_id AS VARCHAR))")
        s"""SELECT lang,
           |  CASE WHEN ($h) % 100 < 80 THEN 'train' ELSE 'test' END AS split,
           |  CAST(count(*) AS BIGINT) AS n, round(avg(n_chars), 2) AS avg_chars
           |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
      }),

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES), the
    // principled way to subsample a corpus proportionally to a quality /
    // length weight: each row draws a DETERMINISTIC uniform u from a salted
    // hash of its id, and the k rows with the largest u^(1/w) per stratum
    // are exactly a weight-proportional sample without replacement. Ranked
    // in log space (ln(u)/w, same order) for numeric stability. Scale: the
    // key is a narrow map; selection is per-source top-k — ONE window
    // shuffle on the stratum key, and because top-k-by-key is associative
    // it degrades gracefully to partial TakeOrdered per partition when
    // strata are few. u divides a power of two so it is EXACTLY
    // representable in both engines; the only libm call (ln) ranks through
    // round(·, 9) per the q_keywords convention, so a 1-ulp divergence
    // cannot flip an answer.
    Q(
      "q_weighted_sample",
      "Efraimidis-Spirakis weighted sample: top-5 docs per source by n_chars weight",
      (s, dir) => {
        val M = 1048576L // 2^20: u = (h % M + 0.5) / M is exact in DOUBLE
        val u = ((TF.polyHash(concat(lit("ws:"), col("doc_id").cast("string"))) % lit(M))
          .cast("double") + lit(0.5)) / lit(M.toDouble)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("kr"), asc("doc_id"))
        tbl(s, dir, "documents")
          .withColumn("key_raw", log(u) / greatest(col("n_chars"), lit(1L)).cast("double"))
          .withColumn("kr", round(col("key_raw"), 9))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"),
            round(col("key_raw"), 6).as("skey"))
          .orderBy("source", "rnk")
      },
      Some {
        val h = OracleText.polyHash("('ws:' || CAST(doc_id AS VARCHAR))")
        s"""WITH k AS (
           |  SELECT source, doc_id, n_chars,
           |    ln((($h) % 1048576 + 0.5) / 1048576.0)
           |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS key_raw
           |  FROM documents),
           |r AS (SELECT *, row_number() OVER (
           |        PARTITION BY source ORDER BY round(key_raw, 9) DESC, doc_id) AS rnk
           |      FROM k)
           |SELECT source, CAST(rnk AS INT) AS rnk, doc_id, n_chars,
           |       round(key_raw, 6) AS skey
           |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin
      }),

    // Corpus mixture planning — the "data mixing" step between curation
    // and training: given a global token budget (here 50% of the corpus)
    // split equally across sources, emit each source's available tokens,
    // its sampling rate (<1 = downsample), and upsampling epochs (>1 when
    // the target exceeds availability — the small-source repeat factor).
    // All plan arithmetic is INTEGER (budget = total/2, per-source target
    // = budget/#sources, epochs as ceil in exact integer math), so the
    // oracle agrees bit-for-bit; only the display rate is a rounded
    // double. One token-count scan + a per-source aggregation; the global
    // total is a broadcast one-row frame — no corpus-wide window.
    Q(
      "q_mixture_plan",
      "token-budget mixture plan per source: availability, rate, epochs",
      (s, dir) => {
        val counts = tbl(s, dir, "documents")
          .select(col("source"), size(TF.tokens(col("text"))).cast("long").as("ntok"))
          .groupBy("source")
          .agg(sum(col("ntok")).as("avail"), count(lit(1)).as("n_docs"))
          .persist() // scanned twice: the totals aggregate + the plan join
        val totals = counts.agg(sum(col("avail")).as("total"),
          count(lit(1)).as("n_sources"))
        Registry.freeAfter(counts.crossJoin(broadcast(totals))
          // `/` on longs is fractional in Spark SQL; DIV is the exact
          // integer division the oracle's `//` mirrors. An all-empty
          // source (avail 0) gets rate/epochs 0 — under ANSI mode the
          // unguarded DIV would throw DIVIDE_BY_ZERO
          .withColumn("target", expr("(total DIV 2) DIV n_sources"))
          .withColumn("rate", when(col("avail") === 0L, lit(0.0)).otherwise(
            round(least(lit(1.0), col("target").cast("double") / col("avail").cast("double")), 6)))
          .withColumn("epochs", when(col("avail") === 0L, lit(0L)).otherwise(
            expr("(target + avail - 1) DIV avail")))
          .select(col("source"), col("n_docs"), col("avail"), col("target"),
            col("rate"), col("epochs"))
          .orderBy("source"), counts)
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH c AS MATERIALIZED (
           |  SELECT source, CAST(sum(len($toks)) AS BIGINT) AS avail,
           |         CAST(count(*) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY source),
           |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total,
           |             CAST(count(*) AS BIGINT) AS n_sources FROM c)
           |SELECT source, n_docs, avail,
           |       (total // 2) // n_sources AS target,
           |       CASE WHEN avail = 0 THEN 0.0 ELSE
           |         round(least(1.0, CAST((total // 2) // n_sources AS DOUBLE)
           |                          / CAST(avail AS DOUBLE)), 6) END AS rate,
           |       CASE WHEN avail = 0 THEN 0 ELSE
           |         ((total // 2) // n_sources + avail - 1) // avail END AS epochs
           |FROM c CROSS JOIN t ORDER BY source""".stripMargin
      }),

    // Vocabulary stats: top-3 tokens by frequency per language (corpus
    // profiling; grouped top-k over token counts).
    Q(
      "q_top_tokens",
      "top-3 most frequent tokens per language",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(desc("n"), asc("tok"))
        tbl(s, dir, "documents")
          .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
          .groupBy("lang", "tok")
          .agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("lang"), col("rnk"), col("tok"), col("n"))
          .orderBy("lang", "rnk")
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS (SELECT lang, unnest($toks) AS tok FROM documents),
           |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY lang, tok),
           |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rnk FROM c)
           |SELECT lang, CAST(rnk AS INT) AS rnk, tok, n FROM r WHERE rnk <= 3
           |ORDER BY lang, rnk""".stripMargin
      }),

    // Document fingerprinting: order-sensitive rolling hash over token
    // hashes (exact-sequence identity) + order-insensitive set fingerprint
    // (bag-of-tokens identity).
    Q(
      "q_fingerprint",
      "rolling-hash document fingerprints (sequence + token-set)",
      (s, dir) => {
        val th = TF.tokenHashes(TF.tokens(col("text")))
        tbl(s, dir, "documents")
          .withColumn("th", th)
          .select(col("doc_id"),
            TF.hashCombine(col("th")).as("fp_seq"),
            TF.hashCombine(array_sort(array_distinct(col("th")))).as("fp_set"))
          .orderBy("doc_id")
      },
      Some {
        val th = OracleText.tokenHashes(OracleText.tokens("text"))
        s"""WITH t AS (SELECT doc_id, $th AS th FROM documents)
           |SELECT doc_id,
           |  ${OracleText.combine("th")} AS fp_seq,
           |  ${OracleText.combine("list_sort(list_distinct(th))")} AS fp_set
           |FROM t ORDER BY doc_id""".stripMargin
      }),

    // Repetition-based quality filters (the Gopher-rule family): documents
    // dominated by a few tokens or repeated n-grams are low-quality training
    // data. distinct-token ratio, most-frequent-token fraction, and
    // duplicate-2-gram fraction — all per-row array math, one narrow codegen
    // scan, no shuffle but the presentation sort. The top-token count is the
    // O(n) hash-map kernel [[TextHashOps.topTokenCount]] — an
    // explode + groupBy(doc_id, tok) + re-join shape would shuffle the whole
    // token stream, and the HOF form it replaced was O(distinct·n) per row.
    Q(
      "q_gopher_repetition",
      "repetition quality filters: distinct ratio, top-token frac, dup-2gram frac",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("toks", TF.tokens(col("text")))
          .withColumn("n", size(col("toks")))
        d
          .withColumn("n_distinct", size(array_distinct(col("toks"))))
          .withColumn("top_cnt", TF.topTokenCount(col("toks")))
          .withColumn("grams", TF.tokenGrams(col("toks"), 2))
          .withColumn("distinct_ratio",
            round(col("n_distinct").cast("double") / greatest(col("n"), lit(1)), 4))
          .withColumn("top_tok_frac",
            round(col("top_cnt").cast("double") / greatest(col("n"), lit(1)), 4))
          .withColumn("dup_2gram_frac",
            round(when(size(col("grams")) === 0, 0.0).otherwise(
              lit(1.0) - size(array_distinct(col("grams"))).cast("double") / size(col("grams"))), 4))
          .select(col("doc_id"), col("n").as("n_toks"),
            col("distinct_ratio"), col("top_tok_frac"), col("dup_2gram_frac"),
            (col("distinct_ratio") >= 0.2 && col("top_tok_frac") <= 0.2 &&
              col("dup_2gram_frac") <= 0.5).as("pass"))
          .orderBy("doc_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
           |m AS (SELECT doc_id, len(toks) AS n,
           |  len(list_distinct(toks)) AS n_distinct,
           |  CASE WHEN len(toks) = 0 THEN 0 ELSE
           |    list_max(list_transform(list_distinct(toks),
           |      t -> len(list_filter(toks, x -> x = t)))) END AS top_cnt,
           |  CASE WHEN len(toks) < 2 THEN [] ELSE
           |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
           |  END AS grams
           |FROM t),
           |r AS (SELECT doc_id, n,
           |  round(CAST(n_distinct AS DOUBLE) / greatest(n, 1), 4) AS distinct_ratio,
           |  round(CAST(top_cnt AS DOUBLE) / greatest(n, 1), 4) AS top_tok_frac,
           |  round(CASE WHEN len(grams) = 0 THEN 0.0
           |        ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END, 4) AS dup_2gram_frac
           |FROM m)
           |SELECT doc_id, CAST(n AS INT) AS n_toks, distinct_ratio, top_tok_frac, dup_2gram_frac,
           |  (distinct_ratio >= 0.2 AND top_tok_frac <= 0.2 AND dup_2gram_frac <= 0.5) AS pass
           |FROM r ORDER BY doc_id""".stripMargin
      }),

    // Bigram language-model quality score — the perplexity-filter shape:
    // train bigram/context counts on the corpus itself (two hash aggregates
    // whose output is O(vocab^2), independent of corpus size), then score
    // each document by add-one-smoothed average log-probability. The count
    // tables join back to the bigram stream on its own grain; at 100 TB both
    // sides shuffle on the bigram key once and AQE picks broadcast when the
    // vocabulary is small enough.
    Q(
      "q_bigram_lm",
      "bigram LM: add-one smoothed avg log-prob + perplexity per document",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
        val vocabSize: Long = docs
          .select(explode(col("toks")).as("t")).agg(countDistinct("t")).head().getLong(0)
        val bi = docs.filter(col("n") >= 2)
          .select(col("doc_id"), explode(TF.tokenGrams(col("toks"), 2)).as("bg"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val biCounts = bi.groupBy("bg").agg(count(lit(1)).as("c12"))
        // context counts derive from the (vocab^2-sized) bigram counts —
        // c1(w1) = sum of c12 over bigrams starting with w1 — so the token
        // stream is scanned twice total (score + counts), never a third time
        val ctxCounts = biCounts
          .withColumn("w1", substring_index(col("bg"), " ", 1))
          .groupBy("w1").agg(sum("c12").as("c1"))
        bi.join(biCounts, "bg").join(ctxCounts, "w1")
          .withColumn("lp", log((col("c12") + 1.0) / (col("c1") + vocabSize.toDouble)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(col("lp")), 4).as("avg_logp"),
            round(exp(-avg(col("lp"))), 2).as("ppl"))
          .orderBy("doc_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
           |v AS (SELECT count(DISTINCT tok) AS vs FROM (SELECT unnest(toks) AS tok FROM t)),
           |b AS MATERIALIZED (
           |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
           |    i -> toks[i] || ' ' || toks[i+1])) AS bg
           |  FROM t WHERE len(toks) >= 2),
           |b2 AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM b),
           |c AS (SELECT bg, count(*) AS c12 FROM b2 GROUP BY bg),
           |u AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
           |sc AS (
           |  SELECT b2.doc_id, ln((c.c12 + 1.0) / (u.c1 + v.vs)) AS lp
           |  FROM b2 JOIN c USING (bg) JOIN u USING (w1) CROSS JOIN v)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  round(avg(lp), 4) AS avg_logp, round(exp(-avg(lp)), 2) AS ppl
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Benchmark DECONTAMINATION — the training-data operator every LLM
    // pipeline runs before training: drop documents sharing long n-grams
    // with held-out evaluation data. Benchmark slice = doc_id % 89 == 0;
    // overlap unit = distinct 8-gram hashes (the fused ShingleHashSet
    // kernel; hash-level on BOTH engines so the rare collision cannot
    // desync the count). The corpus carries little natural overlap, so —
    // like q_pii_redact — each engine injects the SAME canary sentence
    // into doc_id % 13 == 0 and benchmark docs; every canary'd doc must
    // then flag. Scale shape: the benchmark gram set is tiny relative to
    // the corpus (eval sets are MBs) and broadcasts explicitly; the
    // per-doc overlap count aggregates ONLY semi-join survivors (bounded
    // by true contamination volume), then left-joins back to the narrow
    // all-docs frame.
    Q(
      "q_decontaminate",
      "benchmark decontamination: 8-gram-hash overlap vs held-out slice",
      (s, dir) => {
        val canary = " canary alpha bravo charlie delta echo foxtrot golf hotel"
        val aug = when(col("doc_id") % 13 === 0 || col("doc_id") % 89 === 0,
          concat(col("text"), lit(canary))).otherwise(col("text"))
        // persisted: the gram sets feed the benchmark branch, the overlap
        // count, and the final all-docs frame — compute the kernel once
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), TF.tokens(aug).as("toks"))
          .select(col("doc_id"), TF.shingleHashSet(col("toks"), 8).as("g8"))
          .persist()
        val bench = d.filter(col("doc_id") % 89 === 0)
          .select(explode(col("g8")).as("g")).distinct()
        val corpus = d.filter(col("doc_id") % 89 =!= 0)
        val overlaps = corpus
          .select(col("doc_id"), explode(col("g8")).as("g"))
          .join(broadcast(bench), Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        // one row per doc — lazy release (checkpointing O(corpus) would pin
        // corpus-sized blocks; see Registry.releaseLater)
        Registry.releaseLater(corpus.select(col("doc_id"), size(col("g8")).as("n_grams"))
          .join(overlaps, Seq("doc_id"), "left")
          .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
          .select(col("doc_id"), col("n_grams"), col("n_overlap"),
            (col("n_overlap") > 0).as("contaminated"))
          .orderBy("doc_id"), d)
      },
      Some {
        val canary = " canary alpha bravo charlie delta echo foxtrot golf hotel"
        val aug = s"CASE WHEN doc_id % 13 = 0 OR doc_id % 89 = 0 THEN text || '$canary' ELSE text END"
        val g8 = "list_sort(list_distinct(" +
          OracleText.tokenHashes(OracleText.shingles(OracleText.tokens(aug), 8)) + "))"
        s"""WITH d AS MATERIALIZED (SELECT doc_id, $g8 AS g8 FROM documents),
           |bench AS (SELECT DISTINCT unnest(g8) AS g FROM d WHERE doc_id % 89 = 0),
           |corpus AS (SELECT doc_id, g8 FROM d WHERE doc_id % 89 <> 0),
           |ov AS (
           |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           |  FROM (SELECT doc_id, unnest(g8) AS g FROM corpus) c JOIN bench USING (g)
           |  GROUP BY c.doc_id)
           |SELECT corpus.doc_id, CAST(len(corpus.g8) AS INT) AS n_grams,
           |       coalesce(ov.n_overlap, 0) AS n_overlap,
           |       coalesce(ov.n_overlap, 0) > 0 AS contaminated
           |FROM corpus LEFT JOIN ov ON ov.doc_id = corpus.doc_id
           |ORDER BY corpus.doc_id""".stripMargin
      }),

    // Per-source quota — domain balancing: cap every source's contribution
    // at its K best documents (web-scale corpora are dominated by a few
    // hosts; quotas keep the mixture flat). One window shuffle on the
    // source key; rank = (n_chars desc, doc_id) is total, so the kept set
    // is deterministic.
    Q(
      "q_source_quota",
      "domain balancing: keep each source's top-5 docs by length",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))
        tbl(s, dir, "documents")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"))
          .orderBy("source", "rnk")
      },
      Some(
        """SELECT source, CAST(rnk AS INT) AS rnk, doc_id, n_chars
          |FROM (SELECT source, doc_id, n_chars,
          |        row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
          |      FROM documents)
          |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin)),

    // The full training-data pipeline as ONE funnel — the composition a
    // real corpus actually runs, each stage feeding the next: quality gate
    // (q_quality_score's exact formula) -> MinHash-LSH near-dup drop
    // (higher id of each verified pair) -> benchmark decontamination
    // (8-gram hashes vs the held-out doc_id%89 slice, natural overlap) ->
    // per-source quota (top-15 by quality). Emits the survivor count per
    // stage. Every stage is the already-verified operator's own math, so
    // the funnel counts hash-match the oracle's replay of the whole
    // composition — integration-testing the engine end to end.
    Q(
      "q_pipeline_e2e",
      "pipeline funnel: quality -> near-dup -> decontaminate -> quota survivor counts",
      (s, dir) => {
        val base = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("toks", TF.tokens(col("text")))
          .withColumn("n_toks", size(col("toks")))
          .withColumn("quality",
            TF.qualityScore(col("text"), col("toks"), col("n_toks"), StopEn))
          .persist()
        val q1 = base.filter(col("quality") >= 0.51).persist()
        // near-dup: band-bucket candidates among survivors, exact verify
        val sh = q1.select(col("doc_id"), TF.shingleHashSet(col("toks"), 3).as("sh")).persist()
        val bands = sh.select(col("doc_id"),
          posexplode(TF.minhashBandBuckets(col("sh"))).as(Seq("band", "bucket")))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
        val drops = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          .withColumn("jac_raw", inter / (size(col("sh_a")) + size(col("sh_b")) - inter))
          .filter(col("jac_raw") >= 0.5)
          .select(col("doc_b").as("doc_id")).distinct()
        val q2 = q1.join(drops, Seq("doc_id"), "left_anti").persist()
        // decontaminate: the %89 slice is eval data — held out AND used to
        // flag overlapping training docs (natural overlap, no canary)
        val benchG = base.filter(col("doc_id") % 89 === 0)
          .select(explode(TF.shingleHashSet(col("toks"), 8)).as("g")).distinct()
        val cont = q2.filter(col("doc_id") % 89 =!= 0)
          .select(col("doc_id"), explode(TF.shingleHashSet(col("toks"), 8)).as("g"))
          .join(broadcast(benchG), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        val q3 = q2.filter(col("doc_id") % 89 =!= 0)
          .join(cont, Seq("doc_id"), "left_anti").persist()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("quality"), asc("doc_id"))
        val q4 = q3.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 15)
        val funnel = Seq(
          (0, "raw", base.count()), (1, "quality", q1.count()),
          (2, "near_dup", q2.count()), (3, "decontaminated", q3.count()),
          (4, "quota", q4.count()))
        Seq(base, q1, sh, q2, q3).foreach(_.unpersist())
        import s.implicits._
        funnel.toDF("stage", "name", "n_docs").orderBy("stage")
      },
      Some {
        val toks = OracleText.tokens("text")
        val sh3 = "list_sort(list_distinct(" +
          OracleText.tokenHashes(OracleText.shingles("toks", 3)) + "))"
        val g8 = "list_sort(list_distinct(" +
          OracleText.tokenHashes(OracleText.shingles("toks", 8)) + "))"
        val bandSelects = (0 until graft.functions.TextHashOps.MinHashBands).map { j =>
          s"SELECT doc_id, $j AS band, ${OracleText.bandBucket("sh", j)} AS bucket FROM sh"
        }.mkString("\nUNION ALL\n")
        val jac = "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
          "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
        s"""WITH d AS MATERIALIZED (SELECT doc_id, source, text, $toks AS toks FROM documents),
           |q AS MATERIALIZED (SELECT doc_id, source, toks,
           |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 0.4 +
           |  CAST(${sqlHits("toks", StopEn)} AS DOUBLE) / greatest(len(toks), 1) * 0.3 +
           |  least(CAST(coalesce(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))), 0) AS DOUBLE)
           |    / greatest(len(toks), 1) / 8.0, 1.0) * 0.3 AS quality
           |FROM d),
           |q1 AS MATERIALIZED (SELECT * FROM q WHERE quality >= 0.51),
           |sh AS MATERIALIZED (SELECT doc_id, $sh3 AS sh FROM q1),
           |bands AS MATERIALIZED (
           |$bandSelects),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |         FROM bands x JOIN bands y
           |           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |drops AS (SELECT DISTINCT doc_b FROM cand
           |          JOIN sh a ON a.doc_id = cand.doc_a JOIN sh b ON b.doc_id = cand.doc_b
           |          WHERE $jac >= 0.5),
           |q2 AS MATERIALIZED (SELECT * FROM q1 WHERE doc_id NOT IN (SELECT doc_b FROM drops)),
           |bench AS (SELECT DISTINCT unnest(g8) AS g FROM
           |  (SELECT $g8 AS g8 FROM d WHERE doc_id % 89 = 0)),
           |cont AS (SELECT DISTINCT c.doc_id FROM
           |  (SELECT doc_id, unnest($g8) AS g FROM q2 WHERE doc_id % 89 <> 0) c
           |  JOIN bench USING (g)),
           |q3 AS MATERIALIZED (SELECT * FROM q2
           |  WHERE doc_id % 89 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)),
           |q4 AS (SELECT doc_id FROM (
           |    SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk
           |    FROM q3) WHERE rnk <= 15)
           |SELECT * FROM (
           |  SELECT 0 AS stage, 'raw' AS name, CAST((SELECT count(*) FROM d) AS BIGINT) AS n_docs
           |  UNION ALL SELECT 1, 'quality', (SELECT count(*) FROM q1)
           |  UNION ALL SELECT 2, 'near_dup', (SELECT count(*) FROM q2)
           |  UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM q3)
           |  UNION ALL SELECT 4, 'quota', (SELECT count(*) FROM q4)
           |) ORDER BY stage""".stripMargin
      }),

    // Heavy-hitter bigrams via operators.HeavyHitters: a count-min-sketch
    // pass prunes sub-threshold rows BEFORE the aggregation shuffle (CMS
    // never under-counts -> no false negatives; the exact HAVING removes
    // its false positives), so the result is exactly the plain
    // groupBy+HAVING the oracle states — only the shuffle volume differs.
    Q(
      "q_heavy_hitters",
      "bigrams occurring >= 40 times, CMS-pruned exact counts",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
        // HeavyHitters scans `items` twice (sketch pass + exact pass) —
        // stage the explode so the second pass reads columnar cache
        val bi = docs.filter(col("n") >= 2)
          .select(explode(TF.tokenGrams(col("toks"), 2)).as("bg"))
          .persist()
        // threshold 40 yields a non-empty answer at the sf0.01 verify scale
        // (54 bigrams) while still pruning the long sub-threshold tail
        Registry.freeAfter(
          graft.operators.HeavyHitters.exactHeavyHitters(bi, "bg", minCount = 40L)
            .orderBy(desc("n"), asc("bg")), bi)
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
           |b AS (
           |  SELECT unnest(list_transform(range(1, len(toks)),
           |    i -> toks[i] || ' ' || toks[i+1])) AS bg
           |  FROM t WHERE len(toks) >= 2)
           |SELECT bg, CAST(count(*) AS BIGINT) AS n FROM b
           |GROUP BY bg HAVING count(*) >= 40
           |ORDER BY n DESC, bg""".stripMargin
      }),

    // REAL subword tokenization (BPE): token counts, packing, and mixture
    // budgets are denominated in MODEL tokens in practice, and model
    // tokens are subwords. Train is distributed word counts + a
    // deterministic driver fold (graft.functions.Bpe.train); encode is
    // one codegen kernel pass per row — rank-table GREEDY pair merging,
    // O(len log len) per word INDEPENDENT of the merge-table size — under
    // the frozen VOCAB-SCALE artifact (1000 rules, BpeMerges1k; a model
    // artifact, like a shipped tokenizer vocab). The oracle replays the
    // identical table with chained-replace semantics expressed as a
    // recursive CTE over the distinct words (rule i at iteration i), so
    // oracle SQL stays linear in |merges| — exact, not approximate,
    // parity.
    Q(
      "q_bpe_encode",
      "BPE subword token counts per doc under the frozen 1000-rule merges",
      (s, dir) =>
        bpeDocs(s, dir)
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            graft.functions.Bpe.countTokens(col("toks"),
              graft.functions.Bpe.TrainedMerges1k).as("n_bpe"))
          .orderBy("doc_id"),
      Some {
        val toks = OracleText.tokens("text")
        val ctes = graft.functions.Bpe.recursiveCountCtes(
          "SELECT unnest(toks) AS w FROM t",
          graft.functions.Bpe.TrainedMerges1k)
        s"""WITH RECURSIVE src AS ($bpeDocsSql),
           |t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM src),
           |$ctes,
           |x AS (SELECT doc_id, unnest(toks) AS w FROM t),
           |j AS (SELECT doc_id, sum(n_bpe) AS nb
           |      FROM x JOIN bpe_cnt USING (w) GROUP BY doc_id)
           |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_words,
           |       CAST(coalesce(j.nb, 0) AS BIGINT) AS n_bpe
           |FROM t LEFT JOIN j USING (doc_id) ORDER BY doc_id""".stripMargin
      }),

    // Concat-and-chunk SEQUENCE PACKING: the pre-training step that streams
    // tokenized docs in a fixed order into ctx-sized windows; each doc's
    // slot is (pack_id, pack_off) of its starting token. See [[packSlots]]
    // for the three-tier distributed cumsum both denominations share.
    Q(
      "q_seq_packing",
      "sequence packing: (pack, offset) slot of each doc in 512-token windows",
      (s, dir) => packSlots(tbl(s, dir, "documents"),
        size(TF.tokens(col("text"))), ctx = 512),
      Some(packSql(s"len(${OracleText.tokens("text")})", ctx = 512))),

    // The SAME packing pipeline denominated in MODEL tokens: training-data
    // budgets are counted in subword tokens in practice, and whitespace
    // words under-count them (q_bpe_encode's ratio). Identical three-tier
    // plan; only the per-doc count kernel changes.
    Q(
      "q_bpe_pack",
      "sequence packing denominated in BPE subword tokens",
      (s, dir) => packSlots(bpeDocs(s, dir),
        graft.functions.Bpe.countTokens(TF.tokens(col("text")),
          graft.functions.Bpe.TrainedMerges1k), ctx = 512),
      Some {
        val toks = OracleText.tokens("text")
        val ctes = graft.functions.Bpe.recursiveCountCtes(
          "SELECT unnest(toks) AS w FROM tt",
          graft.functions.Bpe.TrainedMerges1k)
        packSqlWith(
          s"""RECURSIVE src AS ($bpeDocsSql),
             |tt AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM src),
             |$ctes,
             |x AS (SELECT doc_id, unnest(toks) AS w FROM tt),
             |j AS (SELECT doc_id, sum(n_bpe) AS nb
             |      FROM x JOIN bpe_cnt USING (w) GROUP BY doc_id),
             |t AS (SELECT tt.doc_id, CAST(coalesce(j.nb, 0) AS BIGINT) AS n_tok
             |      FROM tt LEFT JOIN j USING (doc_id))""".stripMargin, ctx = 512)
      }),

    // RAG-style overlapping CHUNKING: 64-token windows at stride 48 (the
    // retrieval-index preparation step; every doc yields >= 1 chunk, short
    // tails keep their partial window). chunk_fp is the rolling-hash
    // fingerprint of the chunk's tokens — the downstream chunk-level dedup
    // key — computed by the same codegen kernels as q_fingerprint. One
    // narrow scan + explode, no shuffle but the presentation sort; chunk
    // counts scale with token volume, never quadratically.
    Q(
      "q_chunk_overlap",
      "overlapping 64-token chunks at stride 48 with content fingerprints",
      (s, dir) => {
        val w = 64
        val st = 48
        tbl(s, dir, "documents")
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
          .select(col("doc_id"), col("toks"), col("n"),
            posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(st)))
              .as(Seq("chunk_id", "strt")))
          .select(col("doc_id"), col("chunk_id"),
            col("strt").cast("long").as("strt"),
            least(lit(w), col("n") - col("strt")).cast("long").as("chunk_len"),
            TF.hashCombine(TF.tokenHashes(
              slice(col("toks"), col("strt") + 1, lit(w)))).as("chunk_fp"))
          .orderBy("doc_id", "chunk_id")
      },
      Some {
        val toks = OracleText.tokens("text")
        val fp = OracleText.combine(
          OracleText.tokenHashes("list_slice(toks, strt+1, strt+64)"))
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           |s AS (SELECT doc_id, toks, len(toks) AS n,
           |  unnest(range(0, greatest(len(toks), 1), 48)) AS strt FROM t)
           |SELECT doc_id, CAST(strt // 48 AS INT) AS chunk_id,
           |  CAST(strt AS BIGINT) AS strt,
           |  CAST(least(64, n - strt) AS BIGINT) AS chunk_len,
           |  $fp AS chunk_fp
           |FROM s ORDER BY doc_id, chunk_id""".stripMargin
      }),

    // tf-idf KEYWORD extraction: the metadata-enrichment step (topic tags,
    // retrieval boosts) over the whole corpus. Ranking happens on the
    // ROUNDED score (round 4, ties by term) so a 1-ulp ln() difference
    // between engines can never flip a rank. Scale shape: tf is one
    // (doc, term) groupBy; document frequency aggregates from tf (one row
    // per (doc, term) — never re-scanning the token stream) and is
    // vocabulary-sized, i.e. sublinear in the corpus, so it BROADCASTS
    // back instead of shuffling the big tf frame on the skewed term key;
    // the only other shuffle is the per-doc top-3 window.
    Q(
      "q_keywords",
      "tf-idf keyword extraction: top-3 terms per document",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        val nDocs = docs.count().toDouble
        val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .persist() // scanned twice: df aggregation + the scored join
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
        // 3 rows per doc — lazy release (Registry.releaseLater)
        Registry.releaseLater(tf.join(broadcast(dfc), "term")
          .withColumn("score", round(col("tf") * log(lit(nDocs) / col("df")), 4))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
          .orderBy("doc_id", "rank"), tf)
      },
      Some {
        val toks = OracleText.tokens("text")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
           |tf AS MATERIALIZED (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY doc_id, term),
           |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM t),
           |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
           |  round(tf.tf * ln(n.nd / dfc.df), 4) AS score
           |  FROM tf JOIN dfc USING (term) CROSS JOIN n),
           |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           |  ORDER BY score DESC, term) AS rank FROM sc)
           |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
           |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
      })
  )
}
