package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Column-level text-analysis API. Tokenization/shingling are pure built-in
 * compositions (stay in whole-stage codegen, prunable, pushdown-friendly);
 * the hashing kernels are the codegen expressions in [[TextExpressions]].
 *
 * Every function has an exactly-matching DuckDB SQL fragment generator in
 * `graft.queries.OracleText` — same formula, same integer math — so query
 * results hash-match the oracle.
 */
object TextFunctions {

  private def expr1(f: org.apache.spark.sql.catalyst.expressions.Expression =>
      org.apache.spark.sql.catalyst.expressions.Expression)(c: Column): Column =
    Bridge.column(f(Bridge.expression(c)))

  /** Lowercased alphanumeric tokens (empty tokens filtered). Codegen kernel
    * ([[Tokenize]]); bit-identical to the composed
    * `filter(split(lower(trim(text)), "[^a-z0-9]+"), _ != "")` form it
    * replaced, at one compiled char scan per row. */
  def tokens(text: Column): Column = expr1(Tokenize.apply)(text)

  /** Rolling polynomial hash of a string, mod 1e9+7. */
  def polyHash(s: Column): Column = expr1(PolyHash.apply)(s)

  /** Perceptual average-hash of a BINARY media payload as 4 16-bit LSH
    * band values (codegen kernel [[AHashBands]]). */
  def aHashBands(payload: Column): Column = expr1(AHashBands.apply)(payload)

  /** 64-bit rolling hash of every k-wide window of a hash array, one
    * pass (codegen kernel [[WindowHashes]]). */
  def windowHashes(hashes: Column, k: Int): Column =
    expr1(e => WindowHashes(e, k))(hashes)

  /** Occurrences of literal `term` in a token array (codegen tf kernel). */
  def termFreq(toks: Column, term: String): Column =
    expr1(e => TermFreq(e, term))(toks)

  /** Ordered space-joined k-grams, duplicates kept (codegen kernel). */
  def tokenGrams(toks: Column, k: Int): Column =
    expr1(e => TokenGrams(e, k))(toks)

  /** Hash each token: ARRAY<STRING> -> ARRAY<BIGINT>. */
  def tokenHashes(toks: Column): Column = transform(toks, t => polyHash(t))

  /** Word k-shingles joined by single spaces; documents with fewer than k
    * tokens collapse to one shingle (the whole token stream) so every doc
    * has a non-empty shingle set.
    *
    * PERFORMANCE: pass `toks` as a NAMED COLUMN (a prior projection), never
    * an inline `tokens(...)` expression — this function references `toks`
    * several times per gram, and an inlined expression tree is re-evaluated
    * at every reference (measured ~50x slowdown on the dedup pipeline). */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    val idx = sequence(lit(0), n - k) // 0-based start positions, inclusive
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*))
    when(n < k, array(concat_ws(" ", toks))).otherwise(grams)
  }

  /** Fused shingle-hash set: tokens -> sorted distinct k-gram hashes in one
    * compiled loop (bit-identical to
    * `array_sort(array_distinct(tokenHashes(shingles(toks, k))))`). */
  def shingleHashSet(toks: Column, k: Int): Column =
    expr1(e => ShingleHashSet(e, k))(toks)

  /** 12-permutation MinHash signature of a shingle-hash array. */
  def minhashSig(shingleHashes: Column): Column = expr1(MinHashSig.apply)(shingleHashes)

  /** LSH band buckets of the MinHash signature, single pass. */
  def minhashBandBuckets(shingleHashes: Column): Column =
    expr1(MinHashBandBuckets.apply)(shingleHashes)

  /** 32-bit SimHash over token hashes (multiplicity = weight). */
  def simhash32(toksHashes: Column): Column = expr1(SimHash32.apply)(toksHashes)

  /** Order-sensitive rolling fingerprint of a hash array. */
  def hashCombine(hashes: Column): Column = expr1(HashCombine.apply)(hashes)

  /** L2-normalized hashed bag-of-tokens embedding (dim buckets). */
  def hashEmbed(toks: Column, dim: Int): Column =
    expr1(e => HashEmbed(e, dim))(toks)

  /** Fold-sum of a BIGINT array (left-to-right, matches DuckDB list_sum order
    * irrelevance for ints). */
  def bucketLogit(hashes: Column, weights: Seq[Long], bias: Long): Column =
    expr1(BucketLogit(_, weights, bias))(hashes)

  def crossProj(bands: Column): Column = expr1(CrossProj.apply)(bands)

  def sumLong(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x)

  /** [a-z] char count of lower(text) — one-pass codegen replacement for
    * `length(regexp_replace(lower(text), "[^a-z]", ""))`. */
  def countAlpha(text: Column): Column = expr1(CountAlpha.apply)(text)

  /** Max token multiplicity, O(n) hash-map kernel (0 for empty arrays). */
  def topTokenCount(toks: Column): Column = expr1(TopTokenCount.apply)(toks)

  /** Tokens contained in the literal `terms` set (stopword-hit kernel). */
  def countTokensIn(toks: Column, terms: Seq[String]): Column =
    expr1(e => CountTokensIn(e, terms))(toks)

  /** Sum of token character lengths (codegen). */
  def tokenLenSum(toks: Column): Column = expr1(TokenLenSum.apply)(toks)

  /** One-pass normalize: collapse non-alnum runs to single spaces, trim,
    * lowercase (codegen; equals the regex_replace+trim+lower composition). */
  def cleanText(text: Column): Column = expr1(CleanText.apply)(text)

  /** Quality-score components, shared by q_quality_score, q_pipeline_e2e,
    * and the streaming ingest gate — ONE definition so the oracles (which
    * mirror these operation-for-operation) cannot drift from any consumer.
    * Every divisor is guarded: an empty document must score 0 in each
    * term, not NaN (NaN compares greater than any number in Spark, so an
    * unguarded ratio would sail the worst possible document through every
    * `quality >= θ` gate). `toks`/`nToks` must be STAGED columns of
    * tokens(text) / size(toks). */
  def alphaRatio(text: Column): Column =
    countAlpha(text).cast("double") / greatest(length(text), lit(1))

  def stopRatio(toks: Column, nToks: Column, stopwords: Seq[String]): Column =
    countTokensIn(toks, stopwords).cast("int").cast("double") / greatest(nToks, lit(1))

  def avgTokLen(toks: Column, nToks: Column): Column =
    tokenLenSum(toks).cast("double") / greatest(nToks, lit(1))

  /** alpha·0.4 + stop·0.3 + min(avg_tok_len/8, 1)·0.3, fixed operand order
    * (bitwise cross-engine comparable). */
  def qualityScore(text: Column, toks: Column, nToks: Column,
                   stopwords: Seq[String]): Column =
    alphaRatio(text) * 0.4 +
      stopRatio(toks, nToks, stopwords) * 0.3 +
      least(avgTokLen(toks, nToks) / 8.0, lit(1.0)) * 0.3
}
