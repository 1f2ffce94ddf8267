package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Byte-pair-encoding subword tokenization — the real denomination of
 * training-data budgets (q_seq_packing / q_mixture_plan count model
 * tokens in practice, and model tokens are subwords, not whitespace
 * words).
 *
 * Train ([[Bpe.train]]): word frequencies aggregate DISTRIBUTED (the only
 * corpus-sized pass — one explode + one groupBy); the merge loop then
 * folds the VOCAB-sized (word, count) table on the driver, which is the
 * standard trainer shape (every production BPE trainer reduces to word
 * counts first; the vocab is sublinear in the corpus and capped here).
 * Fully deterministic: exact integer pair counts, ties broken by the
 * lexicographically smallest pair.
 *
 * Encode ([[BpeOps.encodeWord]]): apply the merge rules in priority
 * order, each as ONE left-to-right non-overlapping pass (scanning resumes
 * AFTER a merged symbol) — exactly the semantics of chained string
 * `replace()` on a `|c||h||a||r|` delimiter-framed form, which is how the
 * DuckDB oracle replays the encode bit-for-bit (q_bpe_encode).
 */
object Bpe {

  /** The shipped merge table — a MODEL ARTIFACT, like a tokenizer's vocab
    * file: trained once by [[train]] (numMerges = 48) over the sf0.01
    * `documents` corpus and frozen here so the Spark kernel and the
    * DuckDB oracle replay the identical table at any scale factor.
    * Regenerate with `Bpe.train(docs, "text", 48)` if the fixture corpus
    * ever changes (BpeSpec re-derives a prefix and cross-checks). */
  val TrainedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"))

  /** The vocab-scale artifact (1000 rules — see [[BpeMerges1k]]): the
    * table the shipped queries encode under. [[TrainedMerges]] (48 rules)
    * remains the small training-recipe fixture; encode cost is INVARIANT
    * in which table is used (rank-table greedy merging). */
  val TrainedMerges1k: Seq[(String, String)] = BpeMerges1k.merges

  /** Learn `numMerges` merge rules from `docs(textCol)`. Tokenization is
    * the engine-wide alnum kernel ([[TextFunctions.tokens]]), so BPE
    * symbols never cross the same word boundaries every other operator
    * uses. `maxVocab` guards the driver fold (at 100 TB the distinct-word
    * table is millions of rows — still driver-foldable; beyond the cap,
    * raise it or pre-prune rare words). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 1000000): Seq[(String, String)] = {
    val wc = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect()
    require(wc.length <= maxVocab,
      s"vocab ${wc.length} exceeds maxVocab $maxVocab — prune rare words first")
    // mutable symbol sequences, weighted by word frequency
    val words: Array[(Array[String], Long)] = wc.map { r =>
      (r.getString(0).toCharArray.map(String.valueOf), r.getLong(1))
    }
    val seqs = words.map(_._1.toBuffer)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < seqs.length) {
        val s = seqs(wi); val c = words(wi)._2
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) m = numMerges
      else {
        // exact integer argmax; ties -> lexicographically smallest pair,
        // so the learned table is identical on any engine/partitioning
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        wi = 0
        while (wi < seqs.length) {
          val s = seqs(wi)
          var i = 0
          while (i + 1 < s.length) {
            if (s(i) == a && s(i + 1) == b) {
              s(i) = a + b
              s.remove(i + 1)
            }
            i += 1 // resumes AFTER a merged symbol: replace() semantics
          }
          wi += 1
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** BPE token count of a token array under `merges` (codegen kernel). */
  def countTokens(toks: Column, merges: Seq[(String, String)]): Column = {
    val (a, b) = (merges.map(_._1).toArray, merges.map(_._2).toArray)
    org.apache.spark.sql.graftbridge.Bridge.column(
      BpeCount(org.apache.spark.sql.graftbridge.Bridge.expression(toks), a, b))
  }

  /** Encode ONE word to its BPE symbols (spec/demo surface). */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    val (a, b) = (merges.map(_._1).toArray, merges.map(_._2).toArray)
    org.apache.spark.sql.graftbridge.Bridge.column(
      BpeEncodeWord(org.apache.spark.sql.graftbridge.Bridge.expression(word), a, b))
  }

  /** DuckDB SQL fragment: BPE token count of one word `w` — frame each
    * char as `|c|`, chain one `replace('|a||b|','|ab|')` per merge rule
    * in order, count framed tokens. Single source of truth: the SAME
    * Scala merge list feeds the Spark kernel and this fragment. */
  def countSql(w: String, merges: Seq[(String, String)]): String = {
    def lit(s: String) = s.replace("'", "''")
    val framed = s"regexp_replace($w, '(.)', '|\\1|', 'g')"
    val replaced = merges.foldLeft(framed) { case (acc, (a, b)) =>
      s"replace($acc, '|${lit(a)}||${lit(b)}|', '|${lit(a + b)}|')"
    }
    s"((length($replaced) - length(replace($replaced, '|', ''))) // 2)"
  }

  /** DuckDB WITH-clause fragments replaying the merge table as DATA: the
    * rules live in a VALUES relation and a recursive CTE applies rule i at
    * iteration i to the char-framed form — the SAME chained-replace
    * semantics as [[countSql]], expressed iteratively so a 1000-rule
    * table stays linear in SQL size instead of one nested replace() call
    * per rule (which would exceed expression depth). Yields CTEs
    * `bpe_mg(rk, pat, rep)` and `bpe_cnt(w, n_bpe)` over the DISTINCT
    * words of `wordsSql` (a `SELECT ... AS w` query). The caller's WITH
    * clause must be RECURSIVE. */
  def recursiveCountCtes(wordsSql: String, merges: Seq[(String, String)]): String = {
    def lit(s: String) = s.replace("'", "''")
    val rows = merges.zipWithIndex.map { case ((a, b), i) =>
      s"($i, '|${lit(a)}||${lit(b)}|', '|${lit(a + b)}|')"
    }.mkString(", ")
    s"""bpe_mg(rk, pat, rep) AS (VALUES $rows),
       |bpe_w AS MATERIALIZED (SELECT DISTINCT w FROM ($wordsSql)),
       |bpe_e AS (
       |  SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS s, 0 AS i FROM bpe_w
       |  UNION ALL
       |  SELECT e.w, replace(e.s, m.pat, m.rep), e.i + 1
       |  FROM bpe_e e JOIN bpe_mg m ON m.rk = e.i),
       |bpe_cnt AS MATERIALIZED (
       |  SELECT w, CAST((length(s) - length(replace(s, '|', ''))) // 2 AS BIGINT) AS n_bpe
       |  FROM bpe_e WHERE i = ${merges.length})""".stripMargin
  }
}

/** Encode kernels shared by eval and codegen call sites. */
object BpeOps {

  /** Pre-resolved rank table for one merge list: pair -> rank lookup plus
    * the per-rank symbol triples. Built once and cached per merge-array
    * INSTANCE (weak identity keys — the arrays live in the expression
    * objects), so per-word encode never touches the table size. */
  private final class Ranks(val a: Array[String], val b: Array[String]) {
    val merged: Array[String] = Array.tabulate(a.length)(i => a(i) + b(i))
    private val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    // reverse so the LOWEST rank wins should a pair ever repeat (a trained
    // table never repeats one — merging removes every occurrence, and no
    // later merge can recreate a plain-symbol adjacency)
    var i = a.length - 1
    while (i >= 0) {
      m.computeIfAbsent(a(i), _ => new java.util.HashMap[String, Integer]())
        .put(b(i), Integer.valueOf(i))
      i -= 1
    }
    def rank(x: String, y: String): Int = {
      val s = m.get(x)
      if (s == null) -1
      else { val r = s.get(y); if (r == null) -1 else r.intValue() }
    }
  }

  private val rankCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[String], Ranks]())

  private def ranksFor(a: Array[String], b: Array[String]): Ranks = {
    var r = rankCache.get(a)
    if (r == null) { r = new Ranks(a, b); rankCache.put(a, r) }
    r
  }

  /** Encode one word: GREEDY lowest-rank-first pair merging over a linked
    * symbol list with a candidate min-heap — O(len · log len) per word,
    * INDEPENDENT of the merge-table size (the per-rule-pass formulation
    * was O(|merges| · len): ~1000x the work under a real 32k-merge vocab).
    *
    * Identical output to the sequential per-rule replace() passes for any
    * WELL-FORMED table (each rule's symbols are single chars or products
    * of EARLIER rules — every [[Bpe.train]] output, like every trained
    * tokenizer artifact): a merge can only create adjacencies involving
    * its output symbol, and any rule consuming that symbol has a later
    * rank, so no merge ever creates a lower-or-equal-rank candidate —
    * both algorithms apply the same rule set in the same priority order.
    * (BpeSpec cross-checks against the sequential reference.) Heap order
    * is (rank, leftmost position), reproducing the left-to-right
    * non-overlapping scan within each rule. */
  def encodeWord(word: String, mergesA: Array[String],
                 mergesB: Array[String]): Array[String] = {
    val L = word.length
    if (L == 0) return Array.empty
    val sym = new Array[String](L)
    var i = 0
    while (i < L) { sym(i) = String.valueOf(word.charAt(i)); i += 1 }
    if (L == 1 || mergesA.length == 0) return sym
    val rt = ranksFor(mergesA, mergesB)
    val next = new Array[Int](L)
    val prev = new Array[Int](L)
    val alive = new Array[Boolean](L)
    i = 0
    while (i < L) {
      next(i) = if (i + 1 < L) i + 1 else -1
      prev(i) = i - 1
      alive(i) = true
      i += 1
    }
    // min-heap of (rank << 32 | leftIndex): lowest rank first, then
    // leftmost occurrence — candidate entries are lazily invalidated
    // (symbol re-check at pop), never removed
    var heap = new Array[Long](2 * L)
    var hn = 0
    def push(v: Long): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      heap(hn) = v
      var c = hn; hn += 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1
      heap(0) = heap(hn)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var s = c
        if (l < hn && heap(l) < heap(s)) s = l
        if (r < hn && heap(r) < heap(s)) s = r
        if (s == c) done = true
        else { val t = heap(s); heap(s) = heap(c); heap(c) = t; c = s }
      }
      top
    }
    i = 0
    while (i + 1 < L) {
      val r = rt.rank(sym(i), sym(i + 1))
      if (r >= 0) push((r.toLong << 32) | i)
      i += 1
    }
    var live = L
    while (hn > 0 && live > 1) {
      val v = pop()
      val r = (v >>> 32).toInt
      val p = (v & 0xFFFFFFFFL).toInt
      if (alive(p) && sym(p) == rt.a(r)) {
        val q = next(p)
        if (q >= 0 && sym(q) == rt.b(r)) {
          sym(p) = rt.merged(r)
          alive(q) = false
          live -= 1
          val qq = next(q)
          next(p) = qq
          if (qq >= 0) prev(qq) = p
          val pp = prev(p)
          if (pp >= 0) {
            val nr = rt.rank(sym(pp), sym(p))
            if (nr >= 0) push((nr.toLong << 32) | pp)
          }
          if (qq >= 0) {
            val nr = rt.rank(sym(p), sym(qq))
            if (nr >= 0) push((nr.toLong << 32) | p)
          }
        }
      }
    }
    val out = new Array[String](live)
    var j = 0
    i = 0
    while (i < L) { if (alive(i)) { out(j) = sym(i); j += 1 }; i += 1 }
    out
  }

  /** The per-rule-pass reference implementation (exact replace()
    * semantics, O(|merges| · len) per word) — the SEMANTIC SPEC of
    * [[encodeWord]], kept for the cross-check in BpeSpec and as the
    * executable definition the DuckDB oracle replays. Not on any hot
    * path. */
  def encodeWordSequential(word: String, mergesA: Array[String],
                           mergesB: Array[String]): Array[String] = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    var m = 0
    while (m < mergesA.length) {
      val a = mergesA(m); val b = mergesB(m)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 1
    }
    syms.toArray(new Array[String](syms.size))
  }

  def countTokensAD(toks: ArrayData, mergesA: Array[String],
                    mergesB: Array[String]): Long = {
    var total = 0L
    var i = 0
    while (i < toks.numElements()) {
      total += encodeWord(toks.getUTF8String(i).toString, mergesA, mergesB).length
      i += 1
    }
    total
  }

  def encodeWordAD(w: org.apache.spark.unsafe.types.UTF8String,
                   mergesA: Array[String], mergesB: Array[String]): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encodeWord(w.toString, mergesA, mergesB)
        .map(org.apache.spark.unsafe.types.UTF8String.fromString): Array[Any])
}
