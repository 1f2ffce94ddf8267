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
}

/** Encode kernels shared by eval and codegen call sites. */
object BpeOps {

  /** Apply merge rules in priority order to one word — one left-to-right
    * non-overlapping pass per rule (replace() semantics). */
  def encodeWord(word: String, mergesA: Array[String],
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
