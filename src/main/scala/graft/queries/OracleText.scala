package graft.queries

import graft.functions.TextHashOps

/**
 * DuckDB SQL fragment generators mirroring [[graft.functions.TextFunctions]]
 * / [[graft.functions.TextHashOps]] EXACTLY (same tokenization regex, same
 * integer math mod 1e9+7), so text/dedup query results are hash-comparable
 * with the Spark engine. Constants (minhash permutation table, modulus) are
 * emitted as literals from the single Scala source of truth.
 */
object OracleText {
  val P: Long = TextHashOps.P

  /** Lowercased alphanumeric tokens, empties filtered. */
  def tokens(text: String): String =
    s"list_filter(regexp_split_to_array(lower(trim($text)), '[^a-z0-9]+'), t -> t <> '')"

  /** Rolling polynomial hash over Unicode code points, init 7, mod P. */
  def polyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(${TextHashOps.Init} AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), i -> CAST(unicode(substr($s, i, 1)) AS BIGINT))), " +
      s"(a, c) -> (a*31 + c) % $P)"

  /** ARRAY<STRING> -> ARRAY<BIGINT> of per-token hashes. */
  def tokenHashes(toks: String): String =
    s"list_transform($toks, tkn -> ${polyHash("tkn")})"

  /** Order-sensitive rolling combine of a hash list (doc fingerprint). */
  def combine(hashes: String): String =
    s"list_reduce(list_prepend(CAST(${TextHashOps.Init} AS BIGINT), $hashes), (a, h) -> (a*31 + h) % $P)"

  /** Word k-shingles with the <k-tokens fallback (whole stream as 1 shingle). */
  def shingles(toks: String, k: Int): String = {
    val parts = (1 to k).map(o => s"$toks[i+${o - 1}]").mkString(" || ' ' || ")
    s"CASE WHEN len($toks) < $k THEN [array_to_string($toks, ' ')] " +
      s"ELSE list_transform(range(1, len($toks)-${k - 2}), i -> $parts) END"
  }

  /** i-th MinHash permutation min over a hash list (i is 0-based). */
  def minhash(hashes: String, i: Int): String =
    s"coalesce(list_min(list_transform($hashes, h -> (${TextHashOps.MinHashA(i)}*h + ${TextHashOps.MinHashB(i)}) % $P)), $P)"

  /** LSH band bucket: standard rolling combine (init 7) over the list
    * [band, m_{4b}, m_{4b+1}, m_{4b+2}, m_{4b+3}] — identical to the Spark
    * side's `hashCombine(concat(array(band), slice(sig, 4b+1, 4)))`. */
  def bandBucket(hashes: String, band: Int): String = {
    val rows = band * TextHashOps.MinHashRows until (band + 1) * TextHashOps.MinHashRows
    val init = s"(CAST(${TextHashOps.Init} AS BIGINT)*31 + $band) % $P"
    rows.foldLeft(init) { (acc, i) =>
      s"(($acc)*31 + ${minhash(hashes, i)}) % $P"
    }
  }

  /** 32-bit scramble of a poly-hash (Knuth multiplicative). */
  def scramble32(h: String): String = s"(($h) * 2654435761) % 4294967296"

  /** 32-bit SimHash with multiplicity weighting over token hashes. */
  def simhash32(hashes: String): String =
    s"CAST(coalesce(list_sum(list_transform(range(0, 32), j -> " +
      s"CASE WHEN coalesce(list_sum(list_transform($hashes, h -> " +
      s"CASE WHEN ((${scramble32("h")} >> j) & 1) = 1 THEN 1 ELSE -1 END)), 0) >= 0 " +
      s"THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)), 0) AS BIGINT)"
}
