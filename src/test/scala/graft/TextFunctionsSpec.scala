package graft

import graft.functions.{TextFunctions => TF, TextHashOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("polyHash: hand-computed value and empty-string init") {
    // ((7*31+97)*31+98)*31+99 = 304891 — same value DuckDB's fold produces.
    val df = Seq("abc", "").toDF("s").select(TF.polyHash(col("s")).as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(304891L, 7L))
  }

  test("tokens: lowercases, strips punctuation, drops empties") {
    val got = Seq("  Hello, World!  a1 ").toDF("s")
      .select(TF.tokens(col("s"))).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "a1"))
  }

  test("tokenize kernel is bit-identical to the composed regex form on real data") {
    val composed = filter(split(lower(trim(col("text"))), "[^a-z0-9]+"), t => t =!= lit(""))
    val edge = Seq("", "   ", "...", "A", "1a2B!3c", "ä ö ü ß É", "a\tb\nc",
      "ends with punct!", "!starts", "MiXeD CaSe 42").toDF("text")
      .select(TF.tokens(col("text")).as("k"), composed.as("r"))
    edge.collect().foreach(row =>
      assert(row.getSeq[String](0) == row.getSeq[String](1), row.toString))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.tokens(col("text")).as("k"), composed.as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0, "kernel must equal regex pipeline on every fixture doc")
  }

  test("shingleHashSet kernel is bit-identical to the composed pipeline on real data") {
    def composed(toks: org.apache.spark.sql.Column) =
      array_sort(array_distinct(TF.tokenHashes(TF.shingles(toks, 3))))
    val edge = Seq("", "a", "a b", "a b c", "a b c d e", "x x x x").toDF("text")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.shingleHashSet(col("toks"), 3).as("k"), composed(col("toks")).as("r"))
    edge.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.shingleHashSet(col("toks"), 3).as("k"), composed(col("toks")).as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0, "fused kernel must equal composed pipeline on every fixture doc")
  }

  test("tokenGrams kernel equals the sequence/concat_ws form on real data") {
    def composed(toks: org.apache.spark.sql.Column) =
      when(size(toks) < 2, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(toks) - 1), i =>
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    val edge = Seq("", "a", "a b", "a b c d").toDF("text")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.tokenGrams(col("toks"), 2).as("k"), composed(col("toks")).as("r"))
    edge.collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.tokenGrams(col("toks"), 2).as("k"), composed(col("toks")).as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0)
  }

  test("termFreq counts literal-term occurrences like the filter form") {
    val df = Seq("a b a c a", "b b", "").toDF("text")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.termFreq(col("toks"), "a").as("k"),
        size(filter(col("toks"), x => x === lit("a"))).cast("long").as("r"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L, 0L, 0L))
  }

  test("tokenize and term_freq are callable from plain SQL (extensions)") {
    val r = spark.sql(
      "SELECT term_freq(tokenize('a B a c'), 'a') AS n, tokenize('Hi, there!') AS t")
      .head()
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[String](1) == Seq("hi", "there"))
  }

  test("SQL registrations reject wrong arity with a clear error") {
    Seq("SELECT clean_text()", "SELECT clean_text('a', 'b')",
      "SELECT term_freq(tokenize('a'))", "SELECT cosine_sim(array(1.0))").foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      assert(e.getMessage.contains("expects exactly"),
        s"$q should fail with an arity message, got: ${e.getMessage}")
    }
  }

  test("aHashBands: noise-robust on length-preserving edits, sensitive to rewrites") {
    def bands(s: String): Seq[Long] =
      TextHashOps.aHashBands(s.getBytes("UTF-8")).toSeq
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    // empty payload: all-zero hash, no crash
    assert(bands("") == Seq(0L, 0L, 0L, 0L))
    // bands are 16-bit values
    val base = "the quick brown fox jumps over the lazy dog " * 10
    assert(bands(base).forall(b => b >= 0 && b <= 0xffffL))
    // a 3-byte length-preserving corruption (the planted-noise model of
    // q_dedup_phash) moves few bits; a different payload moves many
    val noisy = base.updated(50, 'x').updated(100, 'x').updated(150, 'x')
    assert(ham(bands(base), bands(noisy)) <= 6,
      "length-preserving noise must stay within the dedup threshold")
    val other = "completely different content about spark query planning " * 8
    assert(ham(bands(base), bands(other)) > 6)
    // the codegen path equals the kernel
    val viaCol = Seq(base).toDF("t")
      .select(TF.aHashBands(encode(col("t"), "UTF-8"))).as[Seq[Long]].head()
    assert(viaCol == bands(base))
  }

  test("q_dedup_phash finds the planted noisy twins") {
    val out = graft.queries.Registry.queries("q_dedup_phash")(spark, sf001).collect()
    graft.queries.Registry.releasePending()
    assert(out.nonEmpty, "planted near-duplicate payloads must be found")
    // most pairs pair a doc with its planted twin (img_id + 1000000)
    val planted = out.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted >= out.length / 2,
      s"expected mostly planted pairs, got $planted of ${out.length}")
  }

  test("windowHashes: one rolling pass equals per-window identity semantics") {
    def wh(xs: Seq[Long], k: Int): Seq[Long] = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      TextHashOps.windowHashes(new GenericArrayData(xs.toArray), k).toLongArray().toSeq
    }
    // length n-k+1; short input -> empty
    assert(wh(Seq(1L, 2L, 3L, 4L), 2).length == 3)
    assert(wh(Seq(1L, 2L), 3).isEmpty)
    // equal windows hash equal, regardless of position (rolling must not
    // leak absolute position): [a,b,c,a,b,c] windows 0 and 3 coincide
    val h = wh(Seq(7L, 8L, 9L, 7L, 8L, 9L), 3)
    assert(h.length == 4 && h(0) == h(3) && h.distinct.length == 3,
      s"identical windows must collide, distinct ones must not: $h")
    // codegen column path equals the kernel
    val viaCol = Seq(Seq(7L, 8L, 9L, 7L, 8L, 9L)).toDF("th")
      .select(TF.windowHashes(col("th"), 3)).as[Seq[Long]].head()
    assert(viaCol == h)
  }

  test("shingles: k-grams with short-document fallback") {
    val df = Seq("a b c d", "a b").toDF("s")
      .select(TF.shingles(TF.tokens(col("s")), 3).as("sh")).as[Seq[String]]
    assert(df.collect().toSeq == Seq(Seq("a b c", "b c d"), Seq("a b")))
  }

  test("minhashSig: 12 elements, deterministic, sensitive to content") {
    val sig1 = TextHashOps.minhashSig(Array(1L, 2L, 3L))
    val sig2 = TextHashOps.minhashSig(Array(1L, 2L, 3L))
    val sig3 = TextHashOps.minhashSig(Array(4L, 5L, 6L))
    assert(sig1.length == TextHashOps.NumMinHashes)
    assert(sig1.toSeq == sig2.toSeq)
    assert(sig1.toSeq != sig3.toSeq)
    assert(TextHashOps.minhashSig(Array.empty[Long]).forall(_ == TextHashOps.P))
  }

  test("minhash: near-identical sets agree on most signature positions") {
    val base = Array.tabulate(200)(i => (i * 7919L + 13) % TextHashOps.P)
    val near = base.take(190) ++ Array.tabulate(10)(i => (i * 104729L + 7) % TextHashOps.P)
    val s1 = TextHashOps.minhashSig(base)
    val s2 = TextHashOps.minhashSig(near)
    val agree = s1.zip(s2).count { case (a, b) => a == b }
    assert(agree >= 8, s"expected J~0.9 sets to agree on >=8/12 positions, got $agree")
  }

  test("minhashBandBuckets: one-pass buckets equal combine over sig slices") {
    val hs = Array.tabulate(50)(i => (i * 7919L + 13) % TextHashOps.P)
    val sig = TextHashOps.minhashSig(hs)
    val expected = (0 until TextHashOps.MinHashBands).map { b =>
      TextHashOps.combine(
        Array(b.toLong) ++ sig.slice(b * TextHashOps.MinHashRows, (b + 1) * TextHashOps.MinHashRows))
    }
    assert(TextHashOps.minhashBandBuckets(hs).toSeq == expected)
  }

  test("simhash32: identical input -> distance 0; near input -> small distance") {
    val base = Array.tabulate(150)(i => (i * 7919L + 13) % TextHashOps.P)
    val near = base.take(145) ++ Array.tabulate(5)(i => (i * 104729L + 7) % TextHashOps.P)
    val far = Array.tabulate(150)(i => (i * 99991L + 3) % TextHashOps.P)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (sb, sn, sf) = (TextHashOps.simhash32(base), TextHashOps.simhash32(near), TextHashOps.simhash32(far))
    assert(ham(sb, sb) == 0)
    assert(ham(sb, sn) < ham(sb, sf), s"near=${ham(sb, sn)} far=${ham(sb, sf)}")
    assert((sb & 0xFFFFFFFFL) == sb, "simhash32 fits in 32 bits")
  }

  test("cleanText kernel equals lower∘trim∘regexp_replace on edges and real data") {
    val composed = lower(trim(regexp_replace(col("text"), "[^A-Za-z0-9]+", " ")))
    val edge = Seq("", "   ", "...", "a", "  Hello,   World! 42 ", "ä-b", "A!B?C",
      "!leading", "trailing!", "\ttabs\nand\nnewlines\t").toDF("text")
      .select(TF.cleanText(col("text")).as("k"), composed.as("r"))
    edge.collect().foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.cleanText(col("text")).as("k"), composed.as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0, "cleanText must equal the composed form on every fixture doc")
  }

  test("countAlpha kernel equals the regex-strip form on edges and real data") {
    val composed = length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long")
    val edge = Seq("", "abc", "A1b2C3", "ä ö ü ß É", "no digits!", "1234", "  MiXeD  ")
      .toDF("text")
      .select(TF.countAlpha(col("text")).as("k"), composed.as("r"))
    edge.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.countAlpha(col("text")).as("k"), composed.as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0, "countAlpha must equal the regex form on every fixture doc")
  }

  test("topTokenCount kernel equals the O(distinct*n) HOF form on edges and real data") {
    def composed(toks: org.apache.spark.sql.Column) =
      when(size(toks) === 0, lit(0L)).otherwise(
        array_max(transform(array_distinct(toks),
          t => size(filter(toks, x => x === t)))).cast("long"))
    val edge = Seq("", "a", "a a a", "a b a c a b", "x y z").toDF("text")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.topTokenCount(col("toks")).as("k"), composed(col("toks")).as("r"))
    edge.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(edge.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L, 3L, 1L))
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.tokens(col("text")).as("toks"))
      .select(TF.topTokenCount(col("toks")).as("k"), composed(col("toks")).as("r"))
      .filter(not(col("k") === col("r"))).count()
    assert(mismatches == 0, "hash-map kernel must equal HOF form on every fixture doc")
  }

  test("countTokensIn / tokenLenSum kernels equal their composed forms on real data") {
    val words = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    def hitsComposed(toks: org.apache.spark.sql.Column) =
      size(filter(toks, t => t.isin(words.map(w => w: Any): _*))).cast("long")
    def lenComposed(toks: org.apache.spark.sql.Column) =
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
    val mismatches = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TF.tokens(col("text")).as("toks"))
      .select(
        TF.countTokensIn(col("toks"), words).as("hk"), hitsComposed(col("toks")).as("hr"),
        TF.tokenLenSum(col("toks")).as("lk"), lenComposed(col("toks")).as("lr"))
      .filter(not(col("hk") === col("hr")) || not(col("lk") === col("lr"))).count()
    assert(mismatches == 0)
    val empty = Seq("").toDF("text").select(TF.tokens(col("text")).as("toks"))
      .select(TF.countTokensIn(col("toks"), words), TF.tokenLenSum(col("toks"))).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("expressions survive codegen over real data (no fallback errors)") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        TF.polyHash(col("text")).as("ph"),
        TF.hashCombine(TF.tokenHashes(TF.tokens(col("text")))).as("fp"),
        TF.simhash32(TF.tokenHashes(TF.tokens(col("text")))).as("sh"),
        TF.minhashSig(TF.tokenHashes(TF.shingles(TF.tokens(col("text")), 3))).as("sig"))
    val rows = d.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getSeq[Long](4).length == TextHashOps.NumMinHashes))
    // interpreted (no-codegen) path must agree
    val offRows = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try d.collect() finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(rows.map(_.toString).toSeq == offRows.map(_.toString).toSeq)
  }

  test("crossProj: independent replay, codegen parity, and zero-signature shape") {
    // independent replay of the projection on real aHash signatures
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        TF.aHashBands(encode(col("text"), "UTF-8")).as("hb"))
      .select(col("doc_id"), col("hb"), TF.crossProj(col("hb")).as("nums"))
    val rows = d.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hb = r.getSeq[Long](1)
      val nums = r.getSeq[Long](2)
      assert(nums.length == 64)
      val expect = Array.tabulate(64) { i =>
        (0 until 64).map { j =>
          val bit = (hb(j / 16) >> (j % 16)) & 1L
          (bit * 2 - 1) * (((i * 131 + j * 17) % 7) - 3)
        }.sum
      }
      assert(nums == expect.toSeq, s"projection mismatch at doc ${r.getLong(0)}")
    }
    // interpreted path must agree with codegen
    val offRows = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try d.collect() finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(rows.map(_.toString).toSeq == offRows.map(_.toString).toSeq)
    // all-zero signature: every feature is -1, so num[i] = -Σ_j w_num[i][j]
    val z = Seq(Tuple1(Seq(0L, 0L, 0L, 0L))).toDF("hb")
      .select(TF.crossProj(col("hb")).as("nums")).head().getSeq[Long](0)
    val zExpect = Array.tabulate(64) { i =>
      -(0 until 64).map(j => ((i * 131 + j * 17) % 7) - 3).sum
    }
    assert(z == zExpect.toSeq)
  }
}
