package graft.functions


/**
 * Hermetic protobuf writer for a MINI BERT ENCODER — one full transformer
 * block with the real export's input contract (input_ids / attention_mask
 * / token_type_ids, output last_hidden_state [1, n, h]) and the real
 * export's op inventory: Gather embeddings, Shape→Gather→Unsqueeze→Slice
 * position machinery (runtime-length slice), Reshape(0/-1) head split,
 * 4-D Transpose, batched MatMul, Equal/Where attention masking, Softmax,
 * LayerNormalization, Gelu. Written independently of OnnxWrite (the
 * TinyOnnx discipline) so the parser meets independently produced bytes;
 * verified against an independent straight-loop reference.
 */
object TinyBert {
  import java.io.ByteArrayOutputStream

  final class W(val out: ByteArrayOutputStream = new ByteArrayOutputStream) {
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b)
    }
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def float32(field: Int, v: Float): Unit = {
      tag(field, 5)
      val bits = java.lang.Float.floatToIntBits(v)
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
    }
    def msg(field: Int)(build: W => Unit): Unit = {
      val w = new W(); build(w); bytes(field, w.out.toByteArray)
    }
  }

  private def floatTensor(name: String, dims: Seq[Int], data: Array[Float])(w: W): Unit = {
    dims.foreach(d => w.int(1, d.toLong))
    w.int(2, 1L)
    val bb = java.nio.ByteBuffer.allocate(4 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(9, bb.array())
    w.str(8, name)
  }

  private def int64Tensor(name: String, dims: Seq[Int], data: Array[Long])(w: W): Unit = {
    dims.foreach(d => w.int(1, d.toLong))
    w.int(2, 7L)
    val bb = java.nio.ByteBuffer.allocate(8 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putLong)
    w.bytes(9, bb.array())
    w.str(8, name)
  }

  sealed trait AV
  final case class AI(v: Long) extends AV
  final case class AF(v: Float) extends AV
  final case class AInts(v: Seq[Long]) extends AV

  private def node(op: String, ins: Seq[String], outName: String,
                   attrs: Seq[(String, AV)] = Nil)(w: W): Unit = {
    ins.foreach(w.str(1, _))
    w.str(2, outName)
    w.str(4, op)
    attrs.foreach { case (name, av) =>
      w.msg(5) { a =>
        a.str(1, name)
        av match {
          case AI(v) => a.int(3, v); a.int(20, 2L)
          case AF(v) => a.float32(2, v); a.int(20, 1L)
          case AInts(vs) => vs.foreach(a.int(8, _)); a.int(20, 7L)
        }
      }
    }
  }

  /** All learned weights of the mini encoder, generated once and shared
    * with the reference (the independence is in the computation). */
  final case class Weights(vocabN: Int, maxLen: Int, h: Int, heads: Int, ff: Int,
      wtab: Array[Float], ptab: Array[Float], ttab: Array[Float],
      g1: Array[Float], b1: Array[Float],
      wq: Array[Float], wk: Array[Float], wv: Array[Float],
      wo: Array[Float], bo: Array[Float],
      g2: Array[Float], b2: Array[Float],
      w1: Array[Float], bf1: Array[Float], w2: Array[Float], bf2: Array[Float],
      g3: Array[Float], b3: Array[Float])

  def weights(vocabN: Int, maxLen: Int, h: Int, heads: Int, seed: Int): Weights = {
    val rnd = new scala.util.Random(seed)
    val ff = 2 * h
    def m(n: Int) = Array.fill(n)((rnd.nextDouble() - 0.5).toFloat * 0.6f)
    def ones(n: Int) = Array.fill(n)(1f + (rnd.nextDouble() - 0.5).toFloat * 0.1f)
    Weights(vocabN, maxLen, h, heads,
      ff, m(vocabN * h), m(maxLen * h), m(2 * h),
      ones(h), m(h), m(h * h), m(h * h), m(h * h), m(h * h), m(h),
      ones(h), m(h), m(h * ff), m(ff), m(ff * h), m(h), ones(h), m(h))
  }

  val Eps = 1e-12f

  def model(w: Weights): Array[Byte] = {
    val h = w.h; val dh = h / w.heads
    val out = new W()
    out.msg(7) { g =>
      // embeddings: word + token-type + position (runtime-length slice)
      g.msg(1)(node("Gather", Seq("wtab", "input_ids"), "we"))
      g.msg(1)(node("Gather", Seq("ttab", "token_type_ids"), "te"))
      g.msg(1)(node("Shape", Seq("input_ids"), "shp"))
      g.msg(1)(node("Gather", Seq("shp", "c1i"), "nlen")) // scalar n
      g.msg(1)(node("Unsqueeze", Seq("nlen"), "nlen1", Seq("axes" -> AInts(Seq(0)))))
      g.msg(1)(node("Slice", Seq("ptab", "c0v", "nlen1", "c0v"), "pe0"))
      g.msg(1)(node("Unsqueeze", Seq("pe0"), "pe", Seq("axes" -> AInts(Seq(0)))))
      g.msg(1)(node("Add", Seq("we", "te"), "wt"))
      g.msg(1)(node("Add", Seq("wt", "pe"), "emb"))
      g.msg(1)(node("LayerNormalization", Seq("emb", "g1", "b1"), "ln1",
        Seq("axis" -> AI(-1), "epsilon" -> AF(Eps))))
      // attention
      g.msg(1)(node("MatMul", Seq("ln1", "wq"), "q"))
      g.msg(1)(node("MatMul", Seq("ln1", "wk"), "k"))
      g.msg(1)(node("MatMul", Seq("ln1", "wv"), "v"))
      g.msg(1)(node("Reshape", Seq("q", "hshape"), "q4"))
      g.msg(1)(node("Reshape", Seq("k", "hshape"), "k4"))
      g.msg(1)(node("Reshape", Seq("v", "hshape"), "v4"))
      g.msg(1)(node("Transpose", Seq("q4"), "qh", Seq("perm" -> AInts(Seq(0, 2, 1, 3)))))
      g.msg(1)(node("Transpose", Seq("k4"), "kt", Seq("perm" -> AInts(Seq(0, 2, 3, 1)))))
      g.msg(1)(node("Transpose", Seq("v4"), "vh", Seq("perm" -> AInts(Seq(0, 2, 1, 3)))))
      g.msg(1)(node("MatMul", Seq("qh", "kt"), "sc0"))
      g.msg(1)(node("Mul", Seq("sc0", "cscale"), "sc"))
      // masking: positions whose attention_mask == 0 get -10000
      g.msg(1)(node("Unsqueeze", Seq("attention_mask"), "m4",
        Seq("axes" -> AInts(Seq(1, 2)))))
      g.msg(1)(node("Equal", Seq("m4", "c0i"), "pad"))
      g.msg(1)(node("Where", Seq("pad", "cneg", "c0f"), "mterm"))
      g.msg(1)(node("Add", Seq("sc", "mterm"), "scm"))
      g.msg(1)(node("Softmax", Seq("scm"), "probs", Seq("axis" -> AI(-1))))
      g.msg(1)(node("MatMul", Seq("probs", "vh"), "cxh"))
      g.msg(1)(node("Transpose", Seq("cxh"), "cxb", Seq("perm" -> AInts(Seq(0, 2, 1, 3)))))
      g.msg(1)(node("Reshape", Seq("cxb", "mshape"), "cx"))
      g.msg(1)(node("MatMul", Seq("cx", "wo"), "ao0"))
      g.msg(1)(node("Add", Seq("ao0", "bo"), "ao"))
      g.msg(1)(node("Add", Seq("ao", "ln1"), "res1"))
      g.msg(1)(node("LayerNormalization", Seq("res1", "g2", "b2"), "ln2",
        Seq("axis" -> AI(-1), "epsilon" -> AF(Eps))))
      // feed-forward with exact-erf Gelu
      g.msg(1)(node("MatMul", Seq("ln2", "w1"), "f0"))
      g.msg(1)(node("Add", Seq("f0", "bf1"), "f1"))
      g.msg(1)(node("Gelu", Seq("f1"), "fg"))
      g.msg(1)(node("MatMul", Seq("fg", "w2"), "f2"))
      g.msg(1)(node("Add", Seq("f2", "bf2"), "f3"))
      g.msg(1)(node("Add", Seq("f3", "ln2"), "res2"))
      g.msg(1)(node("LayerNormalization", Seq("res2", "g3", "b3"), "last_hidden_state",
        Seq("axis" -> AI(-1), "epsilon" -> AF(Eps))))
      // initializers
      g.msg(5)(floatTensor("wtab", Seq(w.vocabN, h), w.wtab))
      g.msg(5)(floatTensor("ptab", Seq(w.maxLen, h), w.ptab))
      g.msg(5)(floatTensor("ttab", Seq(2, h), w.ttab))
      g.msg(5)(floatTensor("g1", Seq(h), w.g1))
      g.msg(5)(floatTensor("b1", Seq(h), w.b1))
      g.msg(5)(floatTensor("wq", Seq(h, h), w.wq))
      g.msg(5)(floatTensor("wk", Seq(h, h), w.wk))
      g.msg(5)(floatTensor("wv", Seq(h, h), w.wv))
      g.msg(5)(floatTensor("wo", Seq(h, h), w.wo))
      g.msg(5)(floatTensor("bo", Seq(h), w.bo))
      g.msg(5)(floatTensor("g2", Seq(h), w.g2))
      g.msg(5)(floatTensor("b2", Seq(h), w.b2))
      g.msg(5)(floatTensor("w1", Seq(h, w.ff), w.w1))
      g.msg(5)(floatTensor("bf1", Seq(w.ff), w.bf1))
      g.msg(5)(floatTensor("w2", Seq(w.ff, h), w.w2))
      g.msg(5)(floatTensor("bf2", Seq(h), w.bf2))
      g.msg(5)(floatTensor("g3", Seq(h), w.g3))
      g.msg(5)(floatTensor("b3", Seq(h), w.b3))
      g.msg(5)(int64Tensor("c1i", Seq(), Array(1L))) // scalar index: Shape[1] = n
      g.msg(5)(int64Tensor("c0v", Seq(1), Array(0L)))
      g.msg(5)(int64Tensor("c0i", Seq(1), Array(0L)))
      g.msg(5)(int64Tensor("hshape", Seq(4), Array(0L, -1L, w.heads.toLong, dh.toLong)))
      g.msg(5)(int64Tensor("mshape", Seq(3), Array(0L, -1L, h.toLong)))
      g.msg(5)(floatTensor("cscale", Seq(1), Array((1.0 / math.sqrt(dh)).toFloat)))
      g.msg(5)(floatTensor("cneg", Seq(1), Array(-10000f)))
      g.msg(5)(floatTensor("c0f", Seq(1), Array(0f)))
      g.msg(11)(v => v.str(1, "input_ids"))
      g.msg(11)(v => v.str(1, "attention_mask"))
      g.msg(11)(v => v.str(1, "token_type_ids"))
      g.msg(12)(v => v.str(1, "last_hidden_state"))
    }
    out.out.toByteArray
  }

  // ------------------------------------------------- independent reference

  /** erf via its Maclaurin series in double — an INDEPENDENT formula from
    * the evaluator's rational approximation. Accuracy caveat: the
    * alternating series cancels catastrophically as |x| grows (absolute
    * error ~e^(x²)·1e-16 — ≤1.5e-7 only for |x| ≲ 4, worsening to ~1e-3
    * by the ±5.5 cutoff), so the reference is trustworthy only while
    * pre-Gelu activations keep |x| = |f1|/√2 inside that band. The
    * generated [[weights]] (small random tiles) do; a caller reusing this
    * reference against real-export-scale activations should compare with
    * a tolerance that reflects the band, not the 1.5e-7 headline. */
  def erfSeries(x: Double): Double = {
    if (x > 5.5) return 1.0
    if (x < -5.5) return -1.0
    var term = x
    var sum = x
    var n = 0
    while (n < 160) {
      term = -term * x * x * (2 * n + 1) / ((n + 1.0) * (2 * n + 3))
      sum += term
      n += 1
    }
    sum * 2.0 / math.sqrt(math.Pi)
  }

  /** Straight-loop forward pass; float-casts after each op like the
    * evaluator. Returns the [n, h] hidden states row-major. */
  def reference(w: Weights, ids: Array[Long], mask: Array[Long],
                types: Array[Long]): Array[Float] = {
    val h = w.h; val n = ids.length; val dh = h / w.heads
    def matmul(a: Array[Float], rows: Int, inner: Int,
               b: Array[Float], cols: Int): Array[Float] =
      Array.tabulate(rows * cols) { f =>
        val (i, j) = (f / cols, f % cols)
        var acc = 0.0
        var k = 0
        while (k < inner) { acc += a(i * inner + k).toDouble * b(k * cols + j); k += 1 }
        acc.toFloat
      }
    def addBias(a: Array[Float], rows: Int, cols: Int, b: Array[Float]): Array[Float] =
      Array.tabulate(rows * cols)(f => a(f) + b(f % cols))
    def layerNorm(a: Array[Float], rows: Int, cols: Int,
                  g: Array[Float], b: Array[Float]): Array[Float] = {
      val out = new Array[Float](rows * cols)
      for (i <- 0 until rows) {
        var mu = 0.0
        for (j <- 0 until cols) mu += a(i * cols + j)
        mu /= cols
        var va = 0.0
        for (j <- 0 until cols) { val d = a(i * cols + j) - mu; va += d * d }
        val inv = 1.0 / math.sqrt(va / cols + Eps)
        for (j <- 0 until cols)
          out(i * cols + j) = ((a(i * cols + j) - mu) * inv * g(j) + b(j)).toFloat
      }
      out
    }
    // embeddings
    val emb = Array.tabulate(n * h) { f =>
      val (i, j) = (f / h, f % h)
      val a = (w.wtab(ids(i).toInt * h + j) + w.ttab(types(i).toInt * h + j)).toFloat
      (a + w.ptab(i * h + j)).toFloat
    }
    val ln1 = layerNorm(emb, n, h, w.g1, w.b1)
    val q = matmul(ln1, n, h, w.wq, h)
    val k = matmul(ln1, n, h, w.wk, h)
    val v = matmul(ln1, n, h, w.wv, h)
    // per-head attention
    val cx = new Array[Float](n * h)
    val scale = (1.0 / math.sqrt(dh)).toFloat
    for (hd <- 0 until w.heads) {
      val off = hd * dh
      for (i <- 0 until n) {
        val sc = Array.tabulate(n) { j =>
          var acc = 0.0
          for (d <- 0 until dh) acc += q(i * h + off + d).toDouble * k(j * h + off + d)
          val s = acc.toFloat * scale.toDouble // Mul op: double product, float cast
          (s.toFloat + (if (mask(j) == 0L) -10000f else 0f)).toFloat
        }
        val mx = sc.map(_.toDouble).max
        val e = sc.map(s => math.exp(s - mx))
        val se = e.sum
        val p = e.map(x => (x / se).toFloat)
        for (d <- 0 until dh) {
          var acc = 0.0
          for (j <- 0 until n) acc += p(j).toDouble * v(j * h + off + d)
          cx(i * h + off + d) = acc.toFloat
        }
      }
    }
    val ao = addBias(matmul(cx, n, h, w.wo, h), n, h, w.bo)
    val res1 = Array.tabulate(n * h)(f => ao(f) + ln1(f))
    val ln2 = layerNorm(res1, n, h, w.g2, w.b2)
    val f1 = addBias(matmul(ln2, n, h, w.w1, w.ff), n, w.ff, w.bf1)
    val fg = f1.map(x => (0.5 * x * (1.0 + erfSeries(x / math.sqrt(2.0)))).toFloat)
    val f3 = addBias(matmul(fg, n, w.ff, w.w2, h), n, h, w.bf2)
    val res2 = Array.tabulate(n * h)(f => f3(f) + ln2(f))
    layerNorm(res2, n, h, w.g3, w.b3)
  }
}
