package graft.queries

import graft.functions.{TextFunctions => TF, TextHashOps, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication family for training-data pipelines: exact (hash-groupBy),
 * word-shingle Jaccard, MinHash+LSH (shingle → signature → band → bucket
 * join → exact verify), SimHash (banded Hamming join), and embedding-cosine
 * near-dup. Every variant is a `queries()` entry with a DuckDB oracle built
 * from the same integer math ([[OracleText]]).
 *
 * Scale notes (100 TB):
 *  - exact dedup shuffles one (fp, count, min) row per group after map-side
 *    partial aggregation;
 *  - MinHash LSH is THE scalable near-dup path: the only shuffle is on
 *    (band, bucket) pairs, candidates are verified with exact Jaccard only
 *    within buckets — never O(N^2);
 *  - SimHash uses 4x8-bit banding, which by pigeonhole is EXACT for
 *    Hamming distance <= 3 (some band must match), again avoiding O(N^2);
 *  - q_dedup_jaccard / q_dedup_containment use PREFIX FILTERING (the
 *    PPJoin family): each doc keeps its R globally-rarest shingles, only
 *    docs sharing a kept shingle become candidates, and shingles appearing
 *    in more than `StopShingleCap` docs generate no pairs — so the pair
 *    count is bounded by sum(bucket^2) over rare-shingle buckets, never
 *    O(N^2). (A lang-blocked all-pairs variant of the same queries went
 *    quadratic at the 20x stress scale: 200 s vs ~20 s — §8.3.)
 */
object DedupQueries {
  import Registry.{freeAfter, tbl}
  import org.apache.spark.sql.expressions.Window

  private val K = 3 // word-shingle width
  private val PrefixR = 8 // rarest shingles kept per doc (the PPJoin prefix)
  private val StopShingleCap = 50 // doc-freq above which a shingle pairs nothing

  /** Prefix-filter candidate keys: (doc_id, s) for each doc's `PrefixR`
    * globally-rarest shingles, stop-shingles excluded. The recall guarantee
    * — pairs with Jaccard >= 1 - R/|sh| share a kept shingle — holds for
    * docs that RETAIN at least one sub-cap shingle; a doc whose every
    * shingle exceeds `StopShingleCap` (pure boilerplate duplicated across
    * >50 docs) keeps no prefix and pairs with nothing here. That tail is
    * exactly the population q_dedup_exact's full-fingerprint groupBy
    * catches (mass-duplicated text collapses to shared fingerprints), so
    * the family covers it; ranking stop-shingles last instead of excluding
    * them would restore the guarantee but re-admit the quadratic buckets
    * the cap exists to prevent. Below the threshold this is (like LSH) a
    * high-recall candidate generator whose survivors are exact-verified. */
  private def prefixKept(d: DataFrame): DataFrame = {
    val e = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val f = e.groupBy("s").agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= StopShingleCap)
    val w = Window.partitionBy("doc_id").orderBy(asc("nd"), asc("s"))
    e.join(f, "s")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PrefixR)
      .select(col("doc_id"), col("s"))
  }

  /** The identical prefix selection in DuckDB SQL (same (nd, s) ranking). */
  private def prefixKeptSql: String =
    s"""e AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM d),
       |f AS (SELECT s, count(*) AS nd FROM e GROUP BY s HAVING count(*) <= $StopShingleCap),
       |k AS MATERIALIZED (SELECT doc_id, s FROM (
       |    SELECT e.doc_id, e.s, row_number() OVER (PARTITION BY e.doc_id ORDER BY f.nd, e.s) AS rn
       |    FROM e JOIN f USING (s))
       |  WHERE rn <= $PrefixR)""".stripMargin

  /** doc_id + distinct shingle-hash set (the unit of Jaccard identity).
    * Each stage is a separate projection: `shingles` references its token
    * array many times (size/sequence/element_at per gram), so tokens MUST be
    * a named column — inlining the regex-split expression would re-evaluate
    * it per lambda element (measured ~50x slowdown). CollapseProject leaves
    * multi-referenced non-cheap aliases staged, so this layout is stable. */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), TF.shingleHashSet(col("toks"), K).as("sh"))

  private def shingleSetsSql(extra: String = ""): String = {
    val sh = OracleText.tokenHashes(OracleText.shingles(OracleText.tokens("text"), K))
    s"SELECT doc_id, lang, list_sort(list_distinct($sh)) AS sh FROM documents$extra"
  }

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  private val jaccardSql =
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"

  val all: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on the token-sequence fingerprint. Map-side
    // partial agg -> one row per fingerprint over the wire.
    Q(
      "q_dedup_exact",
      "exact dedup via hash-groupBy on token-sequence fingerprint",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            TF.hashCombine(TF.tokenHashes(TF.tokens(col("text")))).as("fp"))
          .groupBy("fp")
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_dups"))
          .orderBy("keeper"),
      Some {
        val th = OracleText.tokenHashes(OracleText.tokens("text"))
        s"""WITH f AS (SELECT doc_id, ${OracleText.combine(th)} AS fp FROM documents)
           |SELECT fp, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_dups
           |FROM f GROUP BY fp ORDER BY keeper""".stripMargin
      }),

    // Full-corpus 3-gram Jaccard, prefix-filtered (PPJoin shape): candidates
    // share one of each other's R rarest shingles; exact Jaccard verifies.
    // Complements q_dedup_minhash_lsh (probabilistic banding) with the
    // deterministic-prefix alternative.
    Q(
      "q_dedup_jaccard",
      "word 3-gram Jaccard, prefix-filtered candidates, top-20 pairs",
      (s, dir) => {
        // Persist the shingle-set side: it feeds the prefix pipeline and
        // both verification sides.
        val d = shingleSets(s, dir).withColumn("n", size(col("sh"))).persist()
        val kept = prefixKept(d)
        val ka = kept.select(col("doc_id").as("doc_a"), col("s"))
        val kb = kept.select(col("doc_id").as("doc_b"), col("s").as("sb"))
        val cand = ka.join(kb, col("s") === col("sb") && col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val va = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a"))
        val vb = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b"))
        freeAfter(cand.join(va, "doc_a").join(vb, "doc_b")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("jac_raw", col("inter") / (col("n_a") + col("n_b") - col("inter")))
          .orderBy(desc("jac_raw"), asc("doc_a"), asc("doc_b"))
          .limit(20)
          .select(col("doc_a"), col("doc_b"), round(col("jac_raw"), 4).as("jac")), d)
      },
      Some(
        s"""WITH d AS MATERIALIZED (${shingleSetsSql()}),
           |$prefixKeptSql,
           |cand AS (SELECT DISTINCT ka.doc_id AS doc_a, kb.doc_id AS doc_b
           |  FROM k ka JOIN k kb ON ka.s = kb.s AND ka.doc_id < kb.doc_id)
           |SELECT cand.doc_a, cand.doc_b, round($jaccardSql, 4) AS jac
           |FROM cand JOIN d a ON a.doc_id = cand.doc_a JOIN d b ON b.doc_id = cand.doc_b
           |ORDER BY $jaccardSql DESC, doc_a, doc_b LIMIT 20""".stripMargin)),

    // Sketch calibration: MinHash-ESTIMATED Jaccard (fraction of agreeing
    // signature positions) against the exact value, per candidate pair —
    // how a pipeline validates its sketch parameters before trusting the
    // LSH path at scale. All integer math, so even the estimates
    // hash-match the oracle.
    Q(
      "q_minhash_estimate",
      "MinHash sig-agreement Jaccard estimate vs exact, top-20 candidate pairs",
      (s, dir) => {
        val d = shingleSets(s, dir)
          .withColumn("n", size(col("sh")))
          .withColumn("sig", TF.minhashSig(col("sh"))).persist()
        val kept = prefixKept(d)
        val ka = kept.select(col("doc_id").as("doc_a"), col("s"))
        val kb = kept.select(col("doc_id").as("doc_b"), col("s").as("sb"))
        val cand = ka.join(kb, col("s") === col("sb") && col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val va = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("n").as("n_a"), col("sig").as("sig_a"))
        val vb = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("n").as("n_b"), col("sig").as("sig_b"))
        val agree = (0 until graft.functions.TextHashOps.NumMinHashes).map(i =>
          when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1)
            .otherwise(0)).reduce(_ + _)
        freeAfter(cand.join(va, "doc_a").join(vb, "doc_b")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("jac_raw", col("inter") / (col("n_a") + col("n_b") - col("inter")))
          .withColumn("est_raw", agree.cast("double") / graft.functions.TextHashOps.NumMinHashes)
          .orderBy(desc("jac_raw"), asc("doc_a"), asc("doc_b"))
          .limit(20)
          .select(col("doc_a"), col("doc_b"),
            round(col("jac_raw"), 4).as("jac"), round(col("est_raw"), 4).as("est_jac")), d)
      },
      Some {
        val nmh = graft.functions.TextHashOps.NumMinHashes
        def agree(a: String, b: String) = (0 until nmh).map(i =>
          s"CASE WHEN ${OracleText.minhash(a, i)} = ${OracleText.minhash(b, i)} THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")")
        s"""WITH d AS MATERIALIZED (${shingleSetsSql()}),
           |$prefixKeptSql,
           |cand AS (SELECT DISTINCT ka.doc_id AS doc_a, kb.doc_id AS doc_b
           |  FROM k ka JOIN k kb ON ka.s = kb.s AND ka.doc_id < kb.doc_id)
           |SELECT cand.doc_a, cand.doc_b,
           |  round($jaccardSql, 4) AS jac,
           |  round(CAST(${agree("a.sh", "b.sh")} AS DOUBLE) / $nmh, 4) AS est_jac
           |FROM cand JOIN d a ON a.doc_id = cand.doc_a JOIN d b ON b.doc_id = cand.doc_b
           |ORDER BY $jaccardSql DESC, doc_a, doc_b LIMIT 20""".stripMargin
      }),

    // Containment (|A∩B| / |smaller set|) instead of Jaccard: catches
    // near-SUBSET duplicates — a doc wholly embedded in a longer one scores
    // containment ~1.0 but Jaccard only |A|/|B|, so symmetric-similarity
    // dedup misses it. Candidate generation is ONE-SIDED prefix filtering
    // (kept prefix joined against the full posting list): if A ⊆ B, A's
    // rare shingles are IN B even when they are not in B's prefix. Bucket
    // size stays bounded because kept shingles have doc-freq <= cap.
    Q(
      "q_dedup_containment",
      "word 3-gram containment (near-subset detection), top-20 pairs",
      (s, dir) => {
        val d = shingleSets(s, dir).withColumn("n", size(col("sh"))).persist()
        val kept = prefixKept(d)
        val post = d.select(col("doc_id").as("doc_p"), explode(col("sh")).as("sp"))
        val cand = kept.join(post, col("s") === col("sp") && col("doc_id") =!= col("doc_p"))
          .select(least(col("doc_id"), col("doc_p")).as("doc_a"),
            greatest(col("doc_id"), col("doc_p")).as("doc_b"))
          .distinct()
        val va = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a"))
        val vb = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b"))
        freeAfter(cand.join(va, "doc_a").join(vb, "doc_b")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("cont_raw", col("inter") / least(col("n_a"), col("n_b")))
          .orderBy(desc("cont_raw"), asc("doc_a"), asc("doc_b"))
          .limit(20)
          .select(col("doc_a"), col("doc_b"), round(col("cont_raw"), 4).as("containment")), d)
      },
      Some {
        val contSql = "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / least(len(a.sh), len(b.sh))"
        s"""WITH d AS MATERIALIZED (${shingleSetsSql()}),
           |$prefixKeptSql,
           |cand AS (SELECT DISTINCT least(k.doc_id, e.doc_id) AS doc_a,
           |    greatest(k.doc_id, e.doc_id) AS doc_b
           |  FROM k JOIN e ON k.s = e.s AND k.doc_id <> e.doc_id)
           |SELECT cand.doc_a, cand.doc_b, round($contSql, 4) AS containment
           |FROM cand JOIN d a ON a.doc_id = cand.doc_a JOIN d b ON b.doc_id = cand.doc_b
           |ORDER BY $contSql DESC, doc_a, doc_b LIMIT 20""".stripMargin
      }),

    // MinHash + LSH: signature -> 3 band buckets -> bucket equi-join ->
    // exact Jaccard verify >= 0.5. The shuffle carries only (band, bucket)
    // keys; candidate verification is per-bucket, never all-pairs.
    Q(
      "q_dedup_minhash_lsh",
      "MinHash(12)+LSH(3x4) near-dup pairs, exact-Jaccard-verified >= 0.5",
      (s, dir) => {
        // Shingle sets computed ONCE and persisted: reused by band explode
        // (x and y sides) and both verify sides. Band buckets come from the
        // single-pass MinHashBandBuckets expression — composing them from
        // slice(minhashSig(...)) inlines the shingle pipeline per band and
        // drops out of codegen (measured 20x slower).
        val d = shingleSets(s, dir).persist()
        val bands = d
          .select(col("doc_id"), posexplode(TF.minhashBandBuckets(col("sh"))).as(Seq("band", "bucket")))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        freeAfter(cand.join(a, "doc_a").join(b, "doc_b")
          .withColumn("jac_raw", jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jac_raw") >= 0.5)
          .select(col("doc_a"), col("doc_b"), round(col("jac_raw"), 4).as("jac"))
          .orderBy("doc_a", "doc_b"), d)
      },
      Some {
        val bandSelects = (0 until TextHashOps.MinHashBands).map { j =>
          s"SELECT doc_id, $j AS band, ${OracleText.bandBucket("sh", j)} AS bucket FROM d"
        }.mkString("\nUNION ALL\n")
        s"""WITH d AS MATERIALIZED (${shingleSetsSql()}),
           |bands AS MATERIALIZED (
           |$bandSelects),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |         FROM bands x JOIN bands y
           |           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
           |SELECT doc_a, doc_b, round($jaccardSql, 4) AS jac
           |FROM cand JOIN d a ON a.doc_id = doc_a JOIN d b ON b.doc_id = doc_b
           |WHERE $jaccardSql >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // SimHash: collapse identical signatures to one representative FIRST
    // (hash-groupBy — bag-identical docs dedup linearly), then a 4x8-bit
    // banded join over DISTINCT signatures only (exact for Hamming<=3 by
    // pigeonhole). Emitting all-pairs directly is quadratic in dup-group
    // size: a 20x-replication stress test produced 36.8M pairs / 417s,
    // vs linear output after representative collapse. Oracle cross-joins
    // the (small) representative set — identical results, simpler plan.
    Q(
      "q_dedup_simhash",
      "SimHash32 dedup: identical-sig groups + near pairs of representatives",
      (s, dir) => {
        val reps = tbl(s, dir, "documents")
          .select(col("doc_id"),
            TF.simhash32(TF.tokenHashes(TF.tokens(col("text")))).as("sig"))
          .groupBy("sig")
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_members"))
          .persist()
        val bands = reps.select(col("sig"), col("keeper"),
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("band"), shiftright(col("sig"), 8 * j).bitwiseAND(lit(255L)).as("byte"))): _*)).as("bb"))
          .select(col("sig"), col("keeper"), col("bb.band"), col("bb.byte"))
        // O(matching pairs) output — corpus-scale worst case, lazy release
        Registry.releaseLater(bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.byte") === col("y.byte") &&
              col("x.keeper") < col("y.keeper"))
          .select(col("x.keeper").as("rep_a"), col("y.keeper").as("rep_b"),
            col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
          .distinct()
          .withColumn("ham", expr("bit_count(sig_a ^ sig_b)"))
          .filter(col("ham") <= 3)
          .join(reps.select(col("keeper").as("rep_a"), col("n_members").as("n_a")), "rep_a")
          .join(reps.select(col("keeper").as("rep_b"), col("n_members").as("n_b")), "rep_b")
          .select(col("rep_a"), col("rep_b"), col("ham"), col("n_a"), col("n_b"))
          .orderBy("rep_a", "rep_b"), reps)
      },
      Some {
        val sig = OracleText.simhash32(OracleText.tokenHashes(OracleText.tokens("text")))
        s"""WITH sims AS MATERIALIZED (SELECT doc_id, $sig AS sig FROM documents),
           |reps AS MATERIALIZED (
           |  SELECT sig, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_members
           |  FROM sims GROUP BY sig)
           |SELECT a.keeper AS rep_a, b.keeper AS rep_b,
           |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS ham,
           |       a.n_members AS n_a, b.n_members AS n_b
           |FROM reps a JOIN reps b ON a.keeper < b.keeper
           |WHERE bit_count(xor(a.sig, b.sig)) <= 3
           |ORDER BY rep_a, rep_b""".stripMargin
      }),

    // Substring-level EXACT dedup — cross-document repeated >=K-token
    // spans (the "Deduplicating Training Data Makes Language Models
    // Better" pre-training step; doc-level exact/near/semantic dedup
    // misses boilerplate shared INSIDE otherwise-distinct docs). Shape:
    // every K-token window fingerprints with the rolling hash (at 100 TB
    // the candidate shuffle moves 8-byte fps, never text); fp matches
    // verify EXACTLY on the gram text (hash collisions die here); and
    // overlapping window matches merge into MAXIMAL spans by
    // gaps-and-islands on the (doc_a, doc_b, pos_a - pos_b) diagonal —
    // consecutive windows of one long repeat share a diagonal with
    // consecutive positions, so `pos_a - row_number()` groups each run.
    // Never an all-pairs doc join: candidates are fp-bucketed, and a df
    // cap on pathological boilerplate fps composes if a corpus needs it.
    Q(
      "q_dedup_substring",
      "repeated >=20-token cross-document spans, merged to maximal spans",
      (s, dir) => {
        val K = 20
        import org.apache.spark.sql.expressions.Window
        // phase 1 — NARROW fingerprints: every K-token window hashes to a
        // 64-BIT fp over the per-token hashes (no gram string is ever
        // built here — materializing the window TEXT for the whole corpus
        // was the measured bottleneck: 80 s at the 100x stress vs 50 s
        // for this narrow shape (13 s at 20x); at 100 TB the difference is shuffling 8-byte
        // fps vs ~150-byte strings). 64 bits matter: the 30-bit mod-1e9+7
        // kernel birthday-collides ~170k window pairs at 18.5M windows,
        // and every collision graduates to the exact-verify phase
        // (measured: tens of seconds from spurious candidates alone).
        val fps = tbl(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TF.windowHashes(TF.tokenHashes(TF.tokens(col("text"))), K))
              .as(Seq("pos", "fp")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("fp"))
          .persist() // scanned twice: fp-frequency pass + candidate fetch
        // only an fp seen >= 2 times can produce a match — a vanishing
        // fraction of the corpus, so the candidate self-join below joins
        // thousands of narrow rows, never the corpus
        val shared = fps.groupBy("fp").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).select("fp")
        val candW = fps.join(shared, Seq("fp"), "left_semi")
        // persisted: cand is referenced by the verify join AND (twice,
        // through `wins`) by the gram-text fetch — without the cache each
        // branch recomputes the whole corpus-side subtree (measured 139 s
        // uncached vs 50 s cached at the 100x stress). The frame itself is match-bounded
        // (thousands of rows), so caching it is free.
        val cand = candW.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"), col("fp"))
          .join(candW.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"), col("fp")),
            Seq("fp"))
          .filter(col("doc_a") < col("doc_b"))
          .persist()
        // phase 2 — EXACT verify on candidates only: re-derive the window
        // TEXT just for candidate (doc, pos) windows (a semi-joined
        // re-tokenization of the candidate docs — bounded by matches, not
        // the corpus) and require true gram equality, so fp collisions die
        val wins = cand.select(col("doc_a").as("doc_id"), col("pos_a").as("pos"))
          .unionByName(cand.select(col("doc_b").as("doc_id"), col("pos_b").as("pos")))
          .distinct()
        val gramText = tbl(s, dir, "documents")
          .join(wins.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .join(wins, Seq("doc_id"))
          .select(col("doc_id"), col("pos"),
            concat_ws(" ", slice(col("toks"), (col("pos") + 1).cast("int"), lit(K))).as("gram"))
          .persist() // joined twice (a-side, b-side); window-bounded rows
        val verified = cand
          .join(gramText.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
            col("gram").as("gram_a")), Seq("doc_a", "pos_a"))
          .join(gramText.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
            col("gram").as("gram_b")), Seq("doc_b", "pos_b"))
          .filter(col("gram_a") === col("gram_b"))
        val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
        Registry.releaseLater(verified
          .withColumn("diag", col("pos_a") - col("pos_b"))
          .withColumn("run", col("pos_a") - row_number().over(w))
          .groupBy("doc_a", "doc_b", "diag", "run")
          .agg(min("pos_a").as("start_a"), min("pos_b").as("start_b"),
            (count(lit(1)) + lit(K - 1)).as("span_tokens"))
          .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
          .orderBy("doc_a", "doc_b", "start_a", "start_b"), fps, cand, gramText)
      },
      Some {
        val K = 20
        val toks = OracleText.tokens("text")
        s"""WITH t AS MATERIALIZED (SELECT doc_id, $toks AS toks FROM documents),
           |p AS (SELECT doc_id, unnest(range(1, len(toks) - ${K - 2})) AS i FROM t),
           |g AS MATERIALIZED (
           |  SELECT p.doc_id, CAST(p.i - 1 AS BIGINT) AS pos,
           |         array_to_string(t.toks[CAST(p.i AS INT):CAST(p.i + ${K - 1} AS INT)], ' ') AS gram
           |  FROM p JOIN t USING (doc_id)),
           |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |             a.pos AS pos_a, b.pos AS pos_b
           |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
           |runs AS (SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
           |                pos_a - row_number() OVER (
           |                  PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS run
           |         FROM m)
           |SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
           |       CAST(count(*) + ${K - 1} AS BIGINT) AS span_tokens
           |FROM runs GROUP BY doc_a, doc_b, diag, run
           |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin
      }),

    // Perceptual-hash (aHash) dedup over BINARY media payloads — the
    // multimodal counterpart of q_dedup_simhash. The fixture has no binary
    // near-duplicates, so the query PLANTS them (the q_decontaminate
    // canary discipline): every 7th sufficiently-long doc contributes a
    // corrupted twin with 3 bytes overwritten at fixed offsets — the
    // LENGTH-PRESERVING sensor-noise/re-encode model aHash is built for
    // (an insertion shifts every later cell; real decoders normalize that
    // away by resampling to the 8x8 grid, which the stub's relative-
    // position cells emulate). Hash: one codegen kernel pass per payload
    // (TextHashOps.aHashBands — exact integer cell-vs-grand-mean
    // compares, so DuckDB reproduces every bit); banding: 4x16-bit bands,
    // identical-hash groups collapse to a representative FIRST (linear in
    // dup-group size, the q_dedup_simhash discipline), exact hamming
    // verify <= 6 on candidates only.
    Q(
      "q_dedup_phash",
      "perceptual aHash near-dup pairs over planted noisy media payloads",
      (s, dir) => {
        val mut = "concat(substr(text,1,50),'x',substr(text,52,49),'x'," +
          "substr(text,102,49),'x',substr(text,152,1000000))"
        val base = tbl(s, dir, "documents").select(col("doc_id").as("img_id"), col("text"))
        // second plant: a NON-ASCII twin (multi-byte UTF-8 prefix), so the
        // oracle's parity is proven over BYTES, not just the ASCII subset
        // where bytes and code points coincide
        val imgs = base.unionByName(
          base.filter(col("img_id") % 7 === 0 && length(col("text")) >= 160)
            .select((col("img_id") + 1000000L).as("img_id"), expr(mut).as("text")))
          .unionByName(
            base.filter(col("img_id") % 11 === 0 && length(col("text")) >= 160)
              .select((col("img_id") + 2000000L).as("img_id"),
                concat(lit("åß∂é☃"), col("text")).as("text")))
        val reps = imgs
          .select(col("img_id"), TF.aHashBands(encode(col("text"), "UTF-8")).as("hb"))
          .groupBy("hb").agg(min("img_id").as("keeper"), count(lit(1)).as("n_members"))
          .persist()
        val bands = reps.select(col("hb"), col("keeper"),
          posexplode(col("hb")).as(Seq("band", "bval")))
        // O(matching pairs) output — corpus-scale worst case, lazy release
        Registry.releaseLater(bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
              col("x.keeper") < col("y.keeper"))
          .select(col("x.keeper").as("rep_a"), col("y.keeper").as("rep_b"),
            col("x.hb").as("ha"), col("y.hb").as("hb2"))
          .distinct()
          .withColumn("ham", (0 until 4).map(i =>
            expr(s"bit_count(ha[$i] ^ hb2[$i])")).reduce(_ + _).cast("int"))
          .filter(col("ham") <= 6)
          .join(reps.select(col("keeper").as("rep_a"), col("n_members").as("n_a")), "rep_a")
          .join(reps.select(col("keeper").as("rep_b"), col("n_members").as("n_b")), "rep_b")
          .select(col("rep_a"), col("rep_b"), col("ham"), col("n_a"), col("n_b"))
          .orderBy("rep_a", "rep_b"), reps)
      },
      Some {
        val mut = "concat(substr(text,1,50),'x',substr(text,52,49),'x'," +
          "substr(text,102,49),'x',substr(text,152,1000000))"
        s"""WITH imgs AS MATERIALIZED (
           |  SELECT doc_id AS img_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS img_id, $mut AS text FROM documents
           |  WHERE doc_id % 7 = 0 AND length(text) >= 160
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS img_id, 'åß∂é☃' || text AS text FROM documents
           |  WHERE doc_id % 11 = 0 AND length(text) >= 160),
           |hx AS MATERIALIZED (
           |  SELECT img_id, hex(encode(text)) AS h,
           |         CAST(strlen(text) AS BIGINT) AS n
           |  FROM imgs),
           |pos AS (SELECT img_id, unnest(range(0, n)) AS i FROM hx),
           |b AS (SELECT p.img_id, CAST(p.i AS BIGINT) AS i,
           |             CAST(16 * (strpos('0123456789ABCDEF',
           |                               substr(m.h, CAST(2 * p.i + 1 AS INT), 1)) - 1)
           |                     + (strpos('0123456789ABCDEF',
           |                               substr(m.h, CAST(2 * p.i + 2 AS INT), 1)) - 1)
           |                  AS BIGINT) AS v,
           |             m.n
           |      FROM pos p JOIN hx m USING (img_id)),
           |cells AS (SELECT img_id, n, (i * 64) // n AS cell,
           |                 sum(v) AS cs, CAST(count(*) AS BIGINT) AS cc
           |          FROM b GROUP BY img_id, n, (i * 64) // n),
           |tot AS (SELECT img_id, sum(cs) AS ts FROM cells GROUP BY img_id),
           |hbRaw AS (SELECT c.img_id, c.cell // 16 AS band,
           |               sum(CASE WHEN c.cs * c.n > t.ts * c.cc
           |                   THEN (CAST(1 AS BIGINT) << CAST(c.cell % 16 AS INT))
           |                   ELSE 0 END) AS bval
           |         FROM cells c JOIN tot t USING (img_id)
           |         GROUP BY c.img_id, c.cell // 16),
           |spine AS (SELECT img_id, unnest([0, 1, 2, 3]) AS band FROM imgs),
           |hb AS (SELECT s.img_id, CAST(s.band AS BIGINT) AS band,
           |              CAST(coalesce(h.bval, 0) AS BIGINT) AS bval
           |       FROM spine s LEFT JOIN hbRaw h
           |         ON h.img_id = s.img_id AND h.band = s.band),
           |sig AS (SELECT img_id,
           |               string_agg(CAST(bval AS VARCHAR), '_' ORDER BY band) AS sg
           |        FROM hb GROUP BY img_id),
           |reps AS MATERIALIZED (
           |  SELECT sg, min(img_id) AS keeper, CAST(count(*) AS BIGINT) AS n_members
           |  FROM sig GROUP BY sg),
           |rb AS (SELECT r.keeper, h.band, h.bval FROM reps r JOIN hb h ON h.img_id = r.keeper),
           |cand AS (SELECT DISTINCT x.keeper AS rep_a, y.keeper AS rep_b
           |         FROM rb x JOIN rb y
           |           ON x.band = y.band AND x.bval = y.bval AND x.keeper < y.keeper),
           |hm AS (SELECT c.rep_a, c.rep_b,
           |              CAST(sum(bit_count(xor(a.bval, b.bval))) AS INT) AS ham
           |       FROM cand c
           |       JOIN rb a ON a.keeper = c.rep_a
           |       JOIN rb b ON b.keeper = c.rep_b AND b.band = a.band
           |       GROUP BY c.rep_a, c.rep_b)
           |SELECT h.rep_a, h.rep_b, h.ham, ra.n_members AS n_a, rbs.n_members AS n_b
           |FROM hm h JOIN reps ra ON ra.keeper = h.rep_a
           |          JOIN reps rbs ON rbs.keeper = h.rep_b
           |WHERE h.ham <= 6
           |ORDER BY rep_a, rep_b""".stripMargin
      }),

    // Embedding-cosine near-dup, blocked on (label x LSH bucket): label is
    // the category a pipeline blocks on; the 6-plane sign-projection bucket
    // caps block size as data grows (label-only blocking is quadratic —
    // measured 7s at a 20x stress replication and unbounded beyond). Sign
    // LSH puts high-cosine pairs in the same bucket with high probability,
    // so candidates are exactly where near-dups live; top-20 by cosine.
    Q(
      "q_neardup_embedding",
      "embedding-cosine near-dup: top-20 pairs within (label, LSH bucket)",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .withColumn("bucket", AnnQueries.lshBucketCol)
          .persist() // signature computed once; both join sides read the cache
        val a = e.select(col("vec_id").as("vec_a"), col("label"), col("bucket"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
          col("bucket").as("bucket_b"), col("embedding").as("eb"))
        freeAfter(a.join(b, a("label") === b("label_b") && a("bucket") === b("bucket_b") &&
            a("vec_a") < b("vec_b"))
          .withColumn("cos_raw", VF.cosine(col("ea"), col("eb")))
          .orderBy(desc("cos_raw"), asc("vec_a"), asc("vec_b"))
          .limit(20)
          .select(col("vec_a"), col("vec_b"), col("label"), round(col("cos_raw"), 6).as("cos")), e)
      },
      Some {
        val cos = OracleSql.cosine("a.embedding", "b.embedding")
        s"""WITH e AS MATERIALIZED (SELECT vec_id, label, embedding,
           |  ${AnnQueries.bucketSql("embedding")} AS bucket FROM embeddings)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label, round($cos, 6) AS cos
           |FROM e a JOIN e b ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           |ORDER BY $cos DESC, vec_a, vec_b LIMIT 20""".stripMargin
      }),

    // Cluster resolution: near-dup PAIRS under-merge transitive duplicates
    // (A~B, B~C but A!~C); connected components over the verified MinHash
    // edge list turn pairs into GROUPS, each keeping its min-id
    // representative. Spark side is iterative min-label propagation
    // (graft.operators.ConnectedComponents — one shuffle + one hash agg per
    // round, state is one row per vertex); the oracle computes the same
    // labels via a recursive-CTE transitive closure, which is only feasible
    // because the verified edge set is tiny — the closure is O(n^2) per
    // component and exists purely as an independent semantic check.
    Q(
      "q_dedup_clusters",
      "connected components over verified MinHash near-dup pairs",
      (s, dir) => {
        val d = shingleSets(s, dir).persist()
        val bands = d
          .select(col("doc_id"), posexplode(TF.minhashBandBuckets(col("sh"))).as(Seq("band", "bucket")))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        val edges = cand.join(a, "doc_a").join(b, "doc_b")
          .filter(jaccard(col("sh_a"), col("sh_b")) >= 0.5)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        val labels = graft.operators.ConnectedComponents.runAuto(edges)
        val sizes = labels.groupBy("component").agg(count(lit(1)).as("csize"))
        // one row per duplicate doc — O(corpus) worst case, lazy release
        Registry.releaseLater(labels.join(sizes, "component")
          .select(col("id").as("doc_id"), col("component"), col("csize"))
          .orderBy("doc_id"), d)
      },
      Some {
        val bandSelects = (0 until TextHashOps.MinHashBands).map { j =>
          s"SELECT doc_id, $j AS band, ${OracleText.bandBucket("sh", j)} AS bucket FROM d"
        }.mkString("\nUNION ALL\n")
        s"""WITH RECURSIVE d AS MATERIALIZED (${shingleSetsSql()}),
           |bands AS MATERIALIZED (
           |$bandSelects),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |         FROM bands x JOIN bands y
           |           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |edges AS MATERIALIZED (
           |  SELECT doc_a AS src, doc_b AS dst
           |  FROM cand JOIN d a ON a.doc_id = doc_a JOIN d b ON b.doc_id = doc_b
           |  WHERE $jaccardSql >= 0.5),
           |sym AS (SELECT src AS s, dst AS t FROM edges UNION SELECT dst, src FROM edges),
           |reach(id, r) AS (
           |  SELECT DISTINCT s, s FROM sym
           |  UNION
           |  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.t),
           |labeled AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
           |SELECT id AS doc_id, component,
           |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS csize
           |FROM labeled ORDER BY doc_id""".stripMargin
      }),

    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): collapse items
    // whose EMBEDDINGS nearly coincide even when their bytes differ — the
    // re-crawl/re-ingest case exact and MinHash dedup both miss. The
    // fixture models it honestly: the synthetic corpus has no organic
    // near-dups (max in-block cosine 0.36), so the query unions a
    // re-ingested slice (every 5th vector, new ids, embeddings shifted
    // +0.02/dim — cosine ≈ 0.985 to its source, invisible to exact dedup).
    // Blocking is (label × sign-LSH bucket) as q_neardup_embedding; within
    // a block an item drops iff ANY lower-id item sits at cosine ≥ 0.95
    // (chain-collapse semantics — no iteration, so both engines express it
    // as one EXISTS/anti-join). Scale shape: candidate pairs only within
    // blocks; the bucket count grows with N like every LSH family here.
    Q(
      "q_dedup_semantic",
      "semantic dedup: re-ingested near-copies collapse within (label, LSH bucket)",
      (s, dir) => {
        val base = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), col("embedding"))
        // re-ingest ids start past the corpus max — a fixed literal offset
        // would silently collide with real ids at larger scale factors
        val off = base.agg(max("vec_id")).head().getLong(0) + 1L
        val reingest = base.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + off).as("vec_id"), col("label"),
            transform(col("embedding"),
              x => (x.cast("double") + lit(0.02)).cast("float")).as("embedding"))
        val e = base.unionByName(reingest)
          .withColumn("bucket", AnnQueries.lshBucketCol)
          .persist() // signature computed once; both join sides read the cache
        val a = e.select(col("vec_id").as("ida"), col("label").as("la"),
          col("bucket").as("ba"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("idb"), col("label").as("lb"),
          col("bucket").as("bb"), col("embedding").as("eb"))
        val dropped = a.join(b, col("la") === col("lb") && col("ba") === col("bb") &&
            col("ida") < col("idb") && VF.cosine(col("ea"), col("eb")) >= 0.95)
          .select(col("idb").as("vec_id")).distinct()
        val kept = e.join(dropped, Seq("vec_id"), "left_anti")
        freeAfter(e.groupBy("label").agg(count(lit(1)).as("n_total"))
          .join(kept.groupBy("label").agg(count(lit(1)).as("n_kept")), Seq("label"))
          .orderBy("label"), e)
      },
      Some {
        val cos = OracleSql.cosine("a.embedding", "b.embedding")
        s"""WITH base AS (SELECT vec_id, label, embedding FROM embeddings),
           |reingest AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id, label,
           |  list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.02 AS FLOAT)) AS embedding
           |  FROM base WHERE vec_id % 5 = 0),
           |u AS (SELECT * FROM base UNION ALL SELECT * FROM reingest),
           |e AS MATERIALIZED (SELECT vec_id, label, embedding,
           |  ${AnnQueries.bucketSql("embedding")} AS bucket FROM u),
           |dropped AS (SELECT DISTINCT b.vec_id
           |  FROM e a JOIN e b ON a.label = b.label AND a.bucket = b.bucket
           |    AND a.vec_id < b.vec_id AND $cos >= 0.95)
           |SELECT e.label, CAST(count(*) AS BIGINT) AS n_total,
           |  CAST(count(*) - count(dropped.vec_id) AS BIGINT) AS n_kept
           |FROM e LEFT JOIN dropped ON e.vec_id = dropped.vec_id
           |GROUP BY e.label ORDER BY e.label""".stripMargin
      }),

    // GREEDY first-writer-wins ADMISSION — the dedup POLICY an ingest
    // actually enforces at arrival time, vs. the pair/cluster ANALYSES
    // above: documents arrive in doc_id order and one is admitted iff none
    // of its MinHash-LSH band buckets was already claimed by ANY earlier
    // document (admitted or not). That "block against everything seen" is
    // the streaming-feasible variant — blocking only against admitted
    // survivors feeds each verdict into the next and cannot be keyed.
    // One shuffle on the (band, bucket) key for the per-bucket first
    // writer, one per-doc fold — never pairwise. Streaming twin:
    // streaming.StreamOps.nearDupBandVerdicts keeps ONE long of state per
    // bucket and is spec-proven verdict-identical across micro-batches.
    Q(
      "q_dedup_greedy",
      "greedy first-writer-wins LSH admission: per-doc band collisions + verdict",
      (s, dir) => {
        val d = shingleSets(s, dir)
        val bands = d.select(col("doc_id"),
          posexplode(TF.minhashBandBuckets(col("sh"))).as(Seq("band", "bucket")))
        val w = Window.partitionBy("band", "bucket")
        bands.withColumn("first_id", min("doc_id").over(w))
          .withColumn("hit", (col("doc_id") > col("first_id")).cast("int"))
          .groupBy("doc_id")
          .agg(sum("hit").cast("int").as("n_coll"))
          .withColumn("admitted", col("n_coll") === 0)
          .orderBy("doc_id")
      },
      Some {
        val nb = TextHashOps.NumMinHashes / TextHashOps.MinHashRows
        val bandRows = (0 until nb).map(j =>
          s"SELECT doc_id, $j AS band, ${OracleText.bandBucket("sh", j)} AS bucket FROM d")
          .mkString("\n  UNION ALL ")
        s"""WITH d AS MATERIALIZED (${shingleSetsSql()}),
           |b AS MATERIALIZED (
           |  $bandRows),
           |f AS (SELECT band, bucket, min(doc_id) AS first_id FROM b GROUP BY band, bucket),
           |j AS (SELECT b.doc_id, CASE WHEN b.doc_id > f.first_id THEN 1 ELSE 0 END AS hit
           |      FROM b JOIN f USING (band, bucket))
           |SELECT doc_id, CAST(sum(hit) AS INT) AS n_coll, sum(hit) = 0 AS admitted
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
      })
  )
}
