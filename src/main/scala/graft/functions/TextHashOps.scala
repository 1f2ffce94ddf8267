package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic text-hashing kernels shared (by formula) with the DuckDB
 * oracle SQL in [[graft.queries.OracleText]]. Every function here is pure
 * integer math over Unicode code points, so Spark and DuckDB produce
 * bit-identical results — the foundation for hash-verifiable dedup
 * (MinHash/SimHash/fingerprints) and the hashing embedder.
 *
 * All arithmetic stays within Long range: values are reduced mod
 * [[P]] (= 1e9+7) after every combine step, so `acc*31 + x < 3.2e10` and
 * `a*h + b < 1e18 + 1e9` — no overflow on either engine (DuckDB BIGINT).
 *
 * Capability parity with the reference's text processing (tokenize → embed →
 * score, /root/reference/src/embeddings.py:5-6, /root/reference/src/app.py:43-59)
 * plus the large-scale training-data dedup family the reference lacks.
 */
object TextHashOps {

  /** Modulus for all polynomial hashing (prime, fits comfortably in BIGINT). */
  val P: Long = 1000000007L

  /** Initial accumulator — makes hash("") = 7 distinct from hash of nothing. */
  val Init: Long = 7L

  /** MinHash configuration: 12 permutations = 3 bands x 4 rows. With the
    * standard S-curve, collision probability at Jaccard 0.5 per band is
    * 0.5^4 = 6.25%, across 3 bands ~17.6% per pair per band set — tuned for
    * high precision (few false candidates) since verification re-checks
    * exact Jaccard anyway. */
  val NumMinHashes: Int = 12
  val MinHashBands: Int = 3
  val MinHashRows: Int = 4

  /** Permutation constants h_i(x) = (A(i)*x + B(i)) mod P, fixed and shared
    * with the oracle SQL as literals. */
  val MinHashA: Array[Long] = Array.tabulate(NumMinHashes)(i => (654435747L * (i + 1) + 1) % P)
  val MinHashB: Array[Long] = Array.tabulate(NumMinHashes)(i => (368040503L * (i + 7) + 11) % P)

  /** Polynomial rolling hash over Unicode code points (matches DuckDB
    * `unicode(substr(s,i,1))` iteration). */
  def polyHash(u: UTF8String): Long = {
    val s = u.toString
    var acc = Init
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Order-sensitive combine of a hash sequence (rolling doc fingerprint). */
  def combine(hashes: Array[Long]): Long = {
    var acc = Init
    var i = 0
    while (i < hashes.length) { acc = (acc * 31 + hashes(i)) % P; i += 1 }
    acc
  }

  /** 12-element MinHash signature of a shingle-hash set, one pass. */
  def minhashSig(hashes: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumMinHashes)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < NumMinHashes) {
        val v = (MinHashA(j) * h + MinHashB(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    // Empty input -> all-P sentinel (cannot collide with a real min, which is < P).
    if (hashes.isEmpty) java.util.Arrays.fill(sig, P)
    sig
  }

  /** LSH band buckets straight from shingle hashes, one pass: bucket b is the
    * rolling combine (init [[Init]]) of [b, sig(4b), sig(4b+1), sig(4b+2),
    * sig(4b+3)]. Keeping signature+banding in ONE expression keeps the
    * candidate-generation stage fully codegen'd — composing it from
    * slice/concat column expressions inlines the whole shingle pipeline per
    * band and falls back to interpreted eval (measured 20x slower). */
  def minhashBandBuckets(hashes: Array[Long]): Array[Long] = {
    val sig = minhashSig(hashes)
    Array.tabulate(MinHashBands) { b =>
      var acc = (Init * 31 + b) % P
      var r = 0
      while (r < MinHashRows) { acc = (acc * 31 + sig(b * MinHashRows + r)) % P; r += 1 }
      acc
    }
  }

  /** Scramble a poly-hash into 32 unbiased-ish bits (Knuth multiplicative). */
  def scramble32(h: Long): Long = (h * 2654435761L) % 4294967296L

  /** Cross-modal projection numerators: map an aHash band signature (4 ×
    * 16-bit, [[aHashBands]]) into the 64-dim text-embedding space through
    * a FORMULAIC dyadic projection — the hermetic stand-in for a learned
    * CLIP-style image tower (a real deployment swaps in trained weights;
    * the Spark-side shape — codegen per-row projection, then relational
    * top-k — is identical). Bit j of the signature contributes ±1, and
    * W[i][j] has integer numerator `((i·131 + j·17) % 7) − 3` over a
    * fixed denominator 4, so `num[i] = Σ_j feat_j · W_num[i][j]` is EXACT
    * integer arithmetic and `num[i]/4.0` is an exact dyadic double —
    * the oracle replays the whole tower bit-for-bit. */
  def crossProjNums(bands: ArrayData): ArrayData = {
    val out = new Array[Long](64)
    var j = 0
    while (j < 64) {
      val feat = (((bands.getLong(j >> 4) >> (j & 15)) & 1L) << 1) - 1L
      var i = 0
      while (i < 64) {
        out(i) += feat * (((i * 131 + j * 17) % 7) - 3)
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed-linear-model logit: `bias + Σ_token w[hash % |w|]` in EXACT
    * integer arithmetic (weights are pre-quantized longs). The inference
    * kernel of the DSIR/CCNet-style quality classifier — one pass over
    * the token-hash array, no allocation, no floats, so Spark and the
    * DuckDB oracle agree bit-for-bit. polyHash is non-negative (mod P),
    * so plain `%` indexing matches the SQL replay. */
  def bucketLogit(hashes: ArrayData, w: Array[Long], bias: Long): Long = {
    var s = bias
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      s += w((hashes.getLong(i) % w.length).toInt)
      i += 1
    }
    s
  }

  /** 32-bit SimHash over token hashes WITH multiplicity (token counts act as
    * weights). Bit j is 1 when the signed sum of bit-j votes is >= 0. */
  def simhash32(hashes: Array[Long]): Long = {
    val votes = new Array[Int](32)
    var i = 0
    while (i < hashes.length) {
      val h2 = scramble32(hashes(i))
      var j = 0
      while (j < 32) {
        if (((h2 >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) >= 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Hashing embedder: token array -> L2-normalized `dim`-bucket count
    * vector (FLOAT). Deterministic, similarity-preserving capability parity
    * with the reference's text encoder (/root/reference/src/embeddings.py:5-6)
    * — the specific torch model weights are out of scope for a hermetic JVM
    * build; what matters is text -> fixed-dim vector with stable cosine
    * structure. Zero tokens -> zero vector (mirrors l2Normalize's guard). */
  def hashEmbed(toks: Array[UTF8String], dim: Int): Array[Float] = {
    val counts = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      counts((polyHash(toks(i)) % dim).toInt) += 1.0
      i += 1
    }
    var nsq = 0.0
    var j = 0
    while (j < dim) { nsq += counts(j) * counts(j); j += 1 }
    val nrm = math.sqrt(nsq)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) {
      out(j) = if (nrm == 0.0) 0.0f else (counts(j) / nrm).toFloat
      j += 1
    }
    out
  }

  /** Perceptual average-hash (aHash) of a binary media payload over an
    * 8×8 stub cell grid, folded into 4 16-bit LSH band values: byte i
    * lands in cell `i·64/n` (the stub "decode" — a codec build would
    * substitute real 8×8 downsampled luminance and keep everything
    * downstream), bit j of the hash is set iff cell j's mean byte value
    * exceeds the payload's grand mean (compared in EXACT integer
    * cross-multiplication — `sum_j · n > total · count_j` — so any engine
    * reproduces the bits), and band k packs bits [16k, 16k+16). Near-
    * duplicate payloads differ in few cells → few bits → usually share a
    * band, exactly the [[simhash32]] banding story for images. */
  def aHashBands(b: Array[Byte]): Array[Long] = {
    val n = b.length
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (b(i) & 0xff).toLong
      val j = ((i.toLong << 6) / n).toInt
      total += v; sums(j) += v; cnts(j) += 1
      i += 1
    }
    val bands = new Array[Long](4)
    var j = 0
    while (j < 64) {
      if (sums(j) * n > total * cnts(j))
        bands(j >> 4) |= (1L << (j & 15))
      j += 1
    }
    bands
  }

  /** 64-bit hashes of EVERY k-wide window over a hash array in ONE pass —
    * the q_dedup_substring fingerprint kernel. Rolling polynomial over
    * 2^64 (odd multiplier, wrap-around): push = `h·B + x`, pop =
    * `h − x·B^(k−1)`, so each window costs O(1) instead of an O(k) slice
    * + re-hash (the slice form allocates a k-element array per window —
    * hundreds of millions of allocations at stress scale). Each emitted
    * value passes through a bijective finalizer, so the linear structure
    * of the polynomial never shows up in shuffle-partition or groupBy
    * distributions; 64 bits keep birthday collisions negligible at
    * billions of windows (a 30-bit kernel measurably collided at 18M),
    * and every collision that does occur dies in the query's exact-text
    * verify. */
  def windowHashes(th: ArrayData, k: Int): ArrayData = {
    val n = th.numElements()
    if (k <= 0 || n < k) return new GenericArrayData(Array.empty[Long])
    val B = 0x9E3779B97F4A7C15L
    var bk = 1L // B^(k-1), wrapping
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th.getLong(i); i += 1 }
    out(0) = mix64(h)
    i = 0
    while (i + k < n) {
      h = (h - th.getLong(i) * bk) * B + th.getLong(i + k)
      out(i + 1) = mix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Murmur3 finalizer — bijective, so it cannot introduce collisions. */
  private def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  // ---- ArrayData adapters for codegen call sites ----

  def aHashBandsAD(b: Array[Byte]): ArrayData = new GenericArrayData(aHashBands(b))

  def minhashSigAD(a: ArrayData): ArrayData =
    new GenericArrayData(minhashSig(a.toLongArray()))

  def minhashBandBucketsAD(a: ArrayData): ArrayData =
    new GenericArrayData(minhashBandBuckets(a.toLongArray()))

  def simhash32AD(a: ArrayData): Long = simhash32(a.toLongArray())

  def combineAD(a: ArrayData): Long = combine(a.toLongArray())

  def hashEmbedAD(a: ArrayData, dim: Int): ArrayData = {
    val toks = new Array[UTF8String](a.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = a.getUTF8String(i); i += 1 }
    new GenericArrayData(hashEmbed(toks, dim))
  }

  /** Occurrences of token `t` in a string array — the tf kernel behind
    * BM25; equivalent to `size(filter(a, x => x === t))` without the
    * interpreted per-element lambda. */
  def countTokenAD(a: ArrayData, t: UTF8String): Long = {
    val n = a.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (a.getUTF8String(i) == t) c += 1
      i += 1
    }
    c
  }

  /** Fused shingle pipeline: tokens -> polyHash of each space-joined k-gram
    * -> sorted distinct set, one compiled loop. Bit-identical to the
    * composed `array_sort(array_distinct(tokenHashes(shingles(toks, k))))`
    * chain it replaces (each gram's hash streams the same code points the
    * joined string would contain, space = 32 between tokens; short docs
    * collapse to one whole-stream gram like TextFunctions.shingles). */
  def shingleHashSet(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val strs = new Array[String](n)
    var i = 0
    while (i < n) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
    def gramHash(lo: Int, hi: Int): Long = { // tokens [lo, hi)
      var acc = Init
      var t = lo
      while (t < hi) {
        if (t > lo) acc = (acc * 31 + 32L) % P // the joining space
        val s = strs(t)
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31 + cp) % P
          j += Character.charCount(cp)
        }
        t += 1
      }
      acc
    }
    val m = if (n < k) 1 else n - k + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) { out(g) = gramHash(g, math.min(g + k, n)); g += 1 }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Ordered k-gram STRINGS (space-joined, duplicates kept) — equivalent to
    * `transform(sequence(1, n-k+1), i -> concat_ws(' ', toks[i..i+k-1]))`
    * with the n < k case yielding an empty array. The bigram-stream kernel
    * behind LM scoring, heavy hitters, and repetition filters. */
  def tokenGrams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i < n - k + 1) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of [a-z] chars in lower(s) — EXACTLY
    * `length(regexp_replace(lower(s), "[^a-z]", ""))` without allocating the
    * stripped copy or running the regex engine. (Lowering first, like the
    * composed form, so pre-lowered and mixed-case inputs agree; chars outside
    * [a-z] — digits, punctuation, non-ASCII — simply don't count.) The
    * alpha-ratio term of the quality score runs on every document, making
    * this the scan kernel of q_quality_score. */
  def countAlpha(s: UTF8String): Long = {
    val str = s.toLowerCase.toString
    var i = 0
    var c = 0L
    while (i < str.length) {
      val ch = str.charAt(i)
      if (ch >= 'a' && ch <= 'z') c += 1
      i += 1
    }
    c
  }

  /** Occurrences of the most frequent token — EXACTLY
    * `array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))`
    * (0 for an empty array) in ONE O(n) hash-map pass instead of the HOF
    * form's O(distinct·n) nested scans (quadratic for high-diversity docs:
    * a 10k-unique-token document costs 10^8 comparisons there, 10^4 here).
    * The top-token-fraction term of the Gopher repetition filters. */
  def topTokenCount(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](Math.min(n * 2, 1 << 16))
    var best = 0
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(t, Integer.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** Tokens contained in the (small, literal) `terms` set — EXACTLY
    * `size(filter(toks, t -> t IN terms))` without the interpreted
    * per-element lambda. Stopword-hit counting for lang-ID / quality. */
  def countTokensIn(a: ArrayData, terms: Array[UTF8String]): Long = {
    val n = a.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      val t = a.getUTF8String(i)
      var j = 0
      while (j < terms.length) {
        if (terms(j).equals(t)) { c += 1; j = terms.length }
        else j += 1
      }
      i += 1
    }
    c
  }

  /** Sum of token character lengths — EXACTLY
    * `aggregate(transform(toks, t -> length(t)), 0L, _+_)` in one pass
    * (the avg-token-length term of the quality score). */
  def tokenLenSum(a: ArrayData): Long = {
    val n = a.numElements()
    var i = 0
    var s = 0L
    while (i < n) { s += a.getUTF8String(i).numChars(); i += 1 }
    s
  }

  /** Normalize text in one pass — EXACTLY
    * `lower(trim(regexp_replace(s, "[^A-Za-z0-9]+", " ")))`: every run of
    * non-ASCII-alnum chars collapses to a single interior space (boundary
    * runs vanish, which is what the trim contributed), ASCII lowering (the
    * survivors are ASCII alnum, so full lower() agrees). Replaces two regex
    * passes + trim with one compiled char scan. */
  def cleanText(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var pendingSpace = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Tokenize: lowercased maximal runs of [a-z0-9] — EXACTLY equivalent to
    * `filter(split(lower(trim(s)), "[^a-z0-9]+"), _ != "")` (the regex
    * splits on non-alnum runs and the filter drops boundary empties; the
    * leading/trailing whitespace trim is subsumed by run-splitting). Uses
    * UTF8String.toLowerCase — the same Locale-independent lowering as
    * Spark's `lower()` — so results are bit-identical to the composed form,
    * but the scan is ONE compiled char loop instead of a regex engine plus
    * an interpreted per-element filter lambda. */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val n = str.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = str.charAt(j); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        out += UTF8String.fromString(str.substring(i, j))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
