package graft

import graft.attack.Inversion
import graft.functions.TextHashOps
import graft.operators.GroupedTopK
import graft.operators.GroupedTopK.Scored
import graft.functions.TinyBert
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants over seeded random inputs (SURVEY §5.3).
  * Plain deterministic loops — no extra test-framework dependencies. */
class PropertySpec extends AnyFunSuite with SparkTest {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randHashes(r: scala.util.Random, n: Int): Array[Long] =
    Array.fill(n)(math.abs(r.nextLong()) % TextHashOps.P)

  test("polyHash: range [0, P) and prefix sensitivity") {
    val r = rng(1)
    (1 to 200).foreach { _ =>
      val s = r.alphanumeric.take(r.nextInt(50)).mkString
      val h = TextHashOps.polyHash(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(h >= 0 && h < TextHashOps.P)
      val h2 = TextHashOps.polyHash(org.apache.spark.unsafe.types.UTF8String.fromString(s + "x"))
      assert(h2 != h, s"appending must change the hash for '$s'")
    }
  }

  test("round-2 text kernels: invariants over random unicode strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = rng(11)
    // mixed alphabet incl. multi-byte and surrogate-pair chars
    val alphabet = "abzAZ09 .,!ä漢👍\t\n-_"
    def randStr(): String =
      (0 until r.nextInt(80)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    (1 to 300).foreach { _ =>
      val s = randStr()
      val u = UTF8String.fromString(s)
      // countAlpha == ascii-letter count of lower(s), bounded by length
      val ca = TextHashOps.countAlpha(u)
      val naive = s.toLowerCase.count(c => c >= 'a' && c <= 'z')
      assert(ca == naive, s"countAlpha mismatch on '$s'")
      // cleanText: only [a-z0-9 ] survive, no double/boundary spaces, idempotent
      val ct = TextHashOps.cleanText(u).toString
      assert(ct.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '))
      assert(!ct.contains("  ") && ct.trim == ct, s"cleanText spacing on '$s' -> '$ct'")
      assert(TextHashOps.cleanText(UTF8String.fromString(ct)).toString == ct,
        "cleanText must be idempotent")
      // tokenize(s) tokens joined by spaces == cleanText (same normalization)
      val toks = TextHashOps.tokenize(u)
      val joined = (0 until toks.numElements()).map(toks.getUTF8String).mkString(" ")
      assert(joined == ct, s"tokenize∘join must equal cleanText on '$s'")
    }
    // topTokenCount / countTokensIn / tokenLenSum vs naive over random bags
    (1 to 200).foreach { _ =>
      val vocab = Vector("a", "bb", "ccc", "dd", "e")
      val bag = Vector.fill(r.nextInt(60))(vocab(r.nextInt(vocab.length)))
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        bag.map(UTF8String.fromString).toArray[Any])
      val top = TextHashOps.topTokenCount(ad)
      val naiveTop = if (bag.isEmpty) 0L else bag.groupBy(identity).values.map(_.size).max.toLong
      assert(top == naiveTop)
      val terms = Array("a", "ccc").map(UTF8String.fromString)
      assert(TextHashOps.countTokensIn(ad, terms) == bag.count(t => t == "a" || t == "ccc").toLong)
      assert(TextHashOps.tokenLenSum(ad) == bag.map(_.length).sum.toLong)
    }
  }

  test("minhash: signature of a superset is elementwise <= the subset's") {
    val r = rng(2)
    (1 to 100).foreach { _ =>
      val a = randHashes(r, 1 + r.nextInt(100))
      val b = randHashes(r, 1 + r.nextInt(50))
      val sa = TextHashOps.minhashSig(a)
      val sab = TextHashOps.minhashSig(a ++ b)
      assert(sa.zip(sab).forall { case (x, y) => y <= x })
    }
  }

  test("simhash32: always 32-bit; permutation invariant") {
    val r = rng(3)
    (1 to 100).foreach { _ =>
      val hs = randHashes(r, 1 + r.nextInt(200))
      val s1 = TextHashOps.simhash32(hs)
      assert((s1 & 0xFFFFFFFFL) == s1)
      val s2 = TextHashOps.simhash32(r.shuffle(hs.toSeq).toArray)
      assert(s1 == s2, "simhash is a bag operation — order must not matter")
    }
  }

  test("cosine in [-1, 1]; cos(v, v) = 1 for nonzero v; l2sq(v, v) = 0") {
    val r = rng(4)
    (1 to 200).foreach { _ =>
      val n = 1 + r.nextInt(64)
      val a = Array.fill(n)((r.nextDouble() * 2 - 1).toFloat)
      val b = Array.fill(n)((r.nextDouble() * 2 - 1).toFloat)
      val c = Inversion.cosine(a, b)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      if (a.exists(_ != 0f)) assert(math.abs(Inversion.cosine(a, a) - 1.0) < 1e-9)
    }
    assert(Inversion.cosine(Array(0f, 0f), Array(0f, 0f)) == -1.0)
  }

  test("hashEmbed: norm is exactly 0 (no tokens) or ~1") {
    val r = rng(5)
    (1 to 100).foreach { _ =>
      val words = Seq.fill(r.nextInt(20))(r.alphanumeric.take(1 + r.nextInt(8)).mkString)
      val emb = Inversion.embedText(words.mkString(" "), 64)
      val nrm = math.sqrt(emb.map(x => x.toDouble * x.toDouble).sum)
      if (words.isEmpty) assert(nrm == 0.0) else assert(math.abs(nrm - 1.0) < 1e-6)
    }
  }

  test("mutations: closure and bounds under random seeds") {
    val r = rng(6)
    (1 to 200).foreach { _ =>
      val t = (1 to 1 + r.nextInt(6))
        .map(_ => Inversion.Lexicon(r.nextInt(Inversion.Lexicon.length))).mkString(" ")
      val seed = r.nextLong()
      val mc = Inversion.mutateChar(t, seed)
      assert(mc.nonEmpty && mc.forall(c => c.isLower || c.isDigit || c == ' '))
      val mw = Inversion.mutateWord(t, seed)
      assert(mw.split("\\s+").count(_.nonEmpty) <= 41)
      val cx = Inversion.crossover(t, mc, seed)
      assert(cx.length <= t.length + mc.length)
    }
  }

  test("dedupMax is idempotent and keeps the per-text max") {
    val r = rng(7)
    (1 to 50).foreach { _ =>
      val cs = Seq.fill(30)(Inversion.Candidate(s"t${r.nextInt(8)}", r.nextDouble()))
      val d1 = Inversion.dedupMax(cs)
      assert(Inversion.dedupMax(d1) == d1)
      assert(d1.map(_.text).distinct.length == d1.length)
      d1.foreach(c => assert(c.score == cs.filter(_.text == c.text).map(_.score).max))
    }
  }

  test("TopKAgg: any partitioning/merge order yields the same top-k") {
    val r = rng(8)
    val agg = new GroupedTopK.TopKAgg(5)
    (1 to 50).foreach { _ =>
      val rows = Seq.fill(60)(Scored(r.nextInt(20).toDouble, r.nextInt(1000).toLong))
      val expected = rows.sortBy(s => (s.score, s.id)).distinct.take(5)
      // random partitioning + fold order
      val parts = rows.grouped(1 + r.nextInt(10)).toSeq
      val merged = r.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        .foldLeft(agg.zero)(agg.merge)
      // note: duplicates count separately in the aggregator (it is top-k of
      // rows, not distinct values) — compare against row-level expectation
      val expectedRows = rows.sortBy(s => (s.score, s.id)).take(5)
      assert(agg.finish(merged) == expectedRows, s"expected $expectedRows")
      assert(expected.forall(_ != null)) // silence unused warning path
    }
  }

  test("TopKAgg: NaN scores sort last and never block later real candidates") {
    val agg = new GroupedTopK.TopKAgg(3)
    // NaN arrives FIRST while the buffer is underfull — under raw IEEE
    // comparisons it would become an unevictable tail (s < NaN and
    // s == NaN are both false); under the total order every real score
    // beats it
    val rows = Seq(Scored(Double.NaN, 9L), Scored(5.0, 1L), Scored(3.0, 2L),
      Scored(4.0, 3L), Scored(1.0, 4L))
    val got = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(got == Seq(Scored(1.0, 4L), Scored(3.0, 2L), Scored(4.0, 3L)))
    // with fewer reals than k the NaN survives, sorted last
    val few = Seq(Scored(Double.NaN, 9L), Scored(2.0, 1L))
    val gotFew = agg.finish(few.foldLeft(agg.zero)(agg.reduce))
    assert(gotFew.map(_.id) == Seq(1L, 9L))
  }

  test("TopKRows.Buffer: total order on NaN and -0.0 matches the sort") {
    val longOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(org.apache.spark.sql.types.LongType)
    val b = new graft.functions.TopKRows.Buffer(2, longOrd)
    b.insert(Double.NaN, 9L, null)
    b.insert(0.0, 5L, null)
    // -0.0 < 0.0 under Double.compare: it must both be admitted and evict
    // the NaN first, then rank before 0.0
    assert(b.admits(-0.0, 7L))
    b.insert(-0.0, 7L, null)
    assert(b.sortedEntries.map(t => (t._1, t._2)).toSeq == Seq((-0.0, 7L), (0.0, 5L)))
    // a full buffer of reals rejects an equal-score higher id and a NaN
    assert(!b.admits(0.0, 6L))
    assert(!b.admits(Double.NaN, 1L))
    // equal score, LOWER id is admitted (the (score, id) tie-break)
    assert(b.admits(0.0, 4L))
    // the STRING spine (the encrypted store's ids): ties order lexically,
    // matching a window's `order by id` on a string column
    val strOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(org.apache.spark.sql.types.StringType)
    val s = new graft.functions.TopKRows.Buffer(2, strOrd)
    def u(x: String) = org.apache.spark.unsafe.types.UTF8String.fromString(x)
    s.insert(1.0, u("id-10"), null)
    s.insert(1.0, u("id-2"), null)
    assert(s.admits(1.0, u("id-1")))   // "id-1" < "id-10" lexically
    assert(!s.admits(1.0, u("id-3")))  // "id-3" > "id-2" > "id-10"? no: "id-10" < "id-2" < "id-3"
    s.insert(1.0, u("id-1"), null)
    assert(s.sortedEntries.map(_._2.toString).toSeq == Seq("id-1", "id-10"))
  }

  test("tokenize kernel: tokens are nonempty lowercase alnum; idempotent under rejoin") {
    val r = rng(7)
    val alphabet = "aA1 .!é中-_\t"
    (1 to 300).foreach { _ =>
      val s = Array.fill(r.nextInt(40))(alphabet(r.nextInt(alphabet.length))).mkString
      val toks = TextHashOps.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val seq = (0 until toks.numElements()).map(i => toks.getUTF8String(i).toString)
      seq.foreach { t =>
        assert(t.nonEmpty && t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')), s"'$t' from '$s'")
      }
      // re-tokenizing the space-joined tokens is a fixpoint
      val again = TextHashOps.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(seq.mkString(" ")))
      assert((0 until again.numElements()).map(i => again.getUTF8String(i).toString) == seq)
    }
  }

  test("Morton z-order: bijective on the grid and locality-monotone on prefixes") {
    // bijectivity over a 64x64 grid via the spec-reference interleave
    def morton(a: Int, b: Int): Long = {
      var z = 0L
      for (i <- 0 until 8) {
        z |= ((a >> i) & 1).toLong << (2 * i); z |= ((b >> i) & 1).toLong << (2 * i + 1)
      }
      z
    }
    val all = for (a <- 0 until 64; b <- 0 until 64) yield morton(a, b)
    assert(all.distinct.size == 64 * 64, "z-value must be injective on the grid")
    // quadrant property: both coordinates' high bits determine the z high bits,
    // so points in the same half-box share the z prefix
    for (a <- 0 until 32; b <- 0 until 32)
      assert(morton(a, b) < morton(a + 32, b + 32))
  }

  test("containment and Jaccard bounds: J <= C <= 1; C = 1 for subsets") {
    val r = rng(9)
    (1 to 200).foreach { _ =>
      val base = Set.fill(r.nextInt(30) + 2)(r.nextInt(100).toLong)
      val sub = base.take(r.nextInt(base.size) + 1)
      val other = Set.fill(r.nextInt(30) + 2)(r.nextInt(100).toLong)
      def jac(x: Set[Long], y: Set[Long]) = x.intersect(y).size.toDouble / x.union(y).size
      def cont(x: Set[Long], y: Set[Long]) = x.intersect(y).size.toDouble / math.min(x.size, y.size)
      assert(cont(base, sub) == 1.0, "a subset has containment exactly 1")
      assert(jac(base, other) <= cont(base, other) + 1e-12)
      assert(cont(base, other) <= 1.0)
    }
  }

  test("kNN top-k is stable under adding strictly-farther points") {
    val r = rng(9)
    val dim = 16
    val q = Array.fill(dim)(r.nextDouble().toFloat)
    def l2(a: Array[Float]) =
      a.zip(q).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val near = Seq.fill(10)(Array.fill(dim)((r.nextDouble() * 0.5).toFloat))
    val topNear = near.sortBy(l2).take(3).map(_.toSeq)
    val far = Seq.fill(10)(Array.fill(dim)((10 + r.nextDouble()).toFloat))
    val topAll = (near ++ far).sortBy(l2).take(3).map(_.toSeq)
    assert(topNear == topAll, "strictly farther points must not enter the top-k")
  }

  test("WordPiece (r9): reconstruction, determinism, and greedy-prefix maximality over random vocabs") {
    import graft.functions.WordPiece
    val r = rng(17)
    val letters = "abcde"
    def randWord(n: Int): String =
      (0 until n).map(_ => letters(r.nextInt(letters.length))).mkString
    (1 to 60).foreach { _ =>
      // random vocab: some whole words, some continuations, all 1-char
      // pieces present so every word decomposes (no UNK path here)
      val pieces = Set.newBuilder[String]
      letters.foreach { c => pieces += c.toString; pieces += s"##$c" }
      (1 to r.nextInt(20)).foreach(_ => pieces += randWord(r.nextInt(4) + 2))
      (1 to r.nextInt(20)).foreach(_ => pieces += s"##${randWord(r.nextInt(4) + 2)}")
      val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ pieces.result().toSeq.sorted
      val wp = WordPiece.fromTokens(vocab)
      val inVocab = vocab.toSet
      (1 to 20).foreach { _ =>
        val word = randWord(r.nextInt(12) + 1)
        val out = wp.wordpiece(word)
        assert(out == wp.wordpiece(word), "deterministic")
        assert(out.nonEmpty)
        if (out != Seq("[UNK]")) {
          // every emitted piece is a vocab member with correct ## marking
          assert(out.head.take(2) != "##" && out.tail.forall(_.startsWith("##")))
          assert(out.forall(inVocab), s"$word -> $out")
          // stripping continuations reconstructs the word exactly
          assert(out.head + out.tail.map(_.drop(2)).mkString == word,
            s"$word -> $out must reconstruct")
          // greedy maximality: no LONGER vocab piece matches at each start
          var pos = 0
          out.foreach { p =>
            val len = if (pos == 0) p.length else p.length - 2
            ((len + 1) to (word.length - pos)).foreach { l =>
              val cand = (if (pos > 0) "##" else "") + word.substring(pos, pos + l)
              assert(!inVocab(cand),
                s"$word at $pos took '$p' but longer '$cand' is in the vocab")
            }
            pos += len
          }
        }
      }
    }
  }

  test("Onnx (r9): broadcast elementwise ops match a naive shape-expansion reference") {
    import graft.functions.Onnx
    val r = rng(23)
    // hermetic micro-graph: Add(a, b) with random broadcastable shapes
    def addGraph(): Onnx.Graph = {
      val w = new TinyBert.W()
      w.msg(7) { g =>
        g.msg(1) { n => n.str(1, "a"); n.str(1, "b"); n.str(2, "out"); n.str(4, "Add") }
        g.msg(11)(v => v.str(1, "a"))
        g.msg(11)(v => v.str(1, "b"))
        g.msg(12)(v => v.str(1, "out"))
      }
      Onnx.parseModel(w.out.toByteArray)
    }
    val g = addGraph()
    (1 to 80).foreach { _ =>
      // out shape of rank 1..4, each side keeps or collapses dims to 1,
      // possibly dropping leading dims entirely (right-aligned broadcast)
      val outDims = Array.fill(r.nextInt(4) + 1)(r.nextInt(3) + 1)
      def side(): Array[Int] = {
        val kept = outDims.drop(r.nextInt(outDims.length))
        kept.map(d => if (r.nextBoolean()) d else 1)
      }
      val (da, db0) = (side(), side())
      // ensure at least the broadcast target is reachable: one side must
      // carry each out dim — regenerate b against the residual
      val db = outDims.zipWithIndex.map { case (d, i) =>
        val ai = i + da.length - outDims.length
        if (ai >= 0 && da(ai) == d) if (r.nextBoolean()) d else 1 else d
      }.drop(r.nextInt(outDims.length))
      def tensor(dims: Array[Int]) =
        Onnx.Tensor(dims, Array.fill(dims.product)(r.nextInt(100) / 10f))
      val (ta, tb) = (tensor(da), tensor(if (db.isEmpty) Array(1) else db))
      val got = Onnx.run(g, Map("a" -> ta, "b" -> tb))
      // naive reference: expand both sides index by index
      def at(t: Onnx.Tensor, ix: Array[Int]): Float = {
        val off = ix.length - t.dims.length
        var flat = 0
        var i = 0
        while (i < t.dims.length) {
          flat = flat * t.dims(i) + (if (t.dims(i) == 1) 0 else ix(off + i))
          i += 1
        }
        t.data(flat)
      }
      assert(got.dims.toSeq == outDims.toSeq ||
        got.dims.product == got.data.length, "shape sanity")
      val ix = new Array[Int](got.dims.length)
      var flat = 0
      while (flat < got.size) {
        val want = (at(ta, ix).toDouble + at(tb, ix).toDouble).toFloat
        assert(got.data(flat) == want, s"at ${ix.toSeq}: ${got.data(flat)} vs $want")
        var d = got.dims.length - 1
        var carry = true
        while (d >= 0 && carry) {
          ix(d) += 1
          if (ix(d) == got.dims(d)) ix(d) = 0 else carry = false
          d -= 1
        }
        flat += 1
      }
    }
  }

  test("PQ (r10): expression encode/ADC equals the driver twins on random vectors") {
    // the hot == cold foundation: the executor-side expression path and
    // the driver-side twins (PqEncode.encode / PqAdc.eval, what the graph
    // hot tier runs) must agree bit-for-bit on arbitrary inputs, not just
    // the fixtures -- a drift here is a silent recall change, not a crash
    import graft.functions.{PqAdc, PqEncode, VectorFunctions => VF}
    import graft.operators.ProductQuantizer
    import org.apache.spark.sql.functions._
    val r = rng(41)
    val (m, k, subDim) = (4, 16, 4)
    val dim = m * subDim
    val books: ProductQuantizer.Codebooks = Array.tabulate(m)(_ =>
      Array.tabulate(k)(c => (c.toLong,
        Array.fill(subDim)((r.nextDouble() - 0.5).toFloat * 2f))))
    val flat = ProductQuantizer.flatten(books)
    val qe = Array.fill(dim)((r.nextDouble() - 0.5).toFloat * 2f)
    val lut = ProductQuantizer.adcLut(qe, books)
    val vecs = Seq.fill(300)(Array.fill(dim)((r.nextDouble() - 0.5).toFloat * 2f))
    import spark.implicits._
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "emb")
      .select(col("id"), col("emb").cast("array<float>").as("emb"))
    val got = df
      .select(col("id"), VF.pqEncode(col("emb"), flat, m, k).as("c"))
      .withColumn("d", VF.pqAdc(col("c"), lut, k))
      .collect().map(x => (x.getLong(0), x.getAs[Array[Byte]](1), x.getDouble(2)))
      .sortBy(_._1)
    got.foreach { case (i, codes, d) =>
      val wantCodes = PqEncode.encode(vecs(i.toInt), flat, m, k)
      assert(codes.toSeq == wantCodes.toSeq, s"row $i: codes diverge")
      val wantD = PqAdc.eval(wantCodes, lut, k)
      assert(d == wantD, s"row $i: ADC $d != driver twin $wantD (bit equality)")
    }
  }
}
