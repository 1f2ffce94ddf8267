package graft.functions

/**
 * Serialize an ONNX ModelProto (the [[Onnx]] subset) — the format spec in
 * executable form, like [[WeightFileEmbedder.write]]. Used by
 * [[OnnxModels]] to build the shipped demo artifact and by dev tooling;
 * the spec keeps its own independent writer so the parser is never tested
 * against only this code.
 */
object OnnxWrite {

  final class W(val out: java.io.ByteArrayOutputStream = new java.io.ByteArrayOutputStream) {
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
    def msg(field: Int)(build: W => Unit): Unit = {
      val w = new W(); build(w); bytes(field, w.out.toByteArray)
    }
  }

  def floatTensor(name: String, dims: Seq[Int], data: Array[Float])(w: W): Unit = {
    dims.foreach(d => w.int(1, d.toLong))
    w.int(2, 1L) // data_type = FLOAT
    val bb = java.nio.ByteBuffer.allocate(4 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(9, bb.array()) // raw_data
    w.str(8, name)
  }

  def int64Tensor(name: String, dims: Seq[Int], data: Array[Long])(w: W): Unit = {
    dims.foreach(d => w.int(1, d.toLong))
    w.int(2, 7L) // data_type = INT64
    val bb = java.nio.ByteBuffer.allocate(8 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putLong)
    w.bytes(9, bb.array()) // raw_data
    w.str(8, name)
  }

  /** Node attribute values the transformer graphs carry. */
  sealed trait AV
  final case class AI(v: Long) extends AV
  final case class AF(v: Float) extends AV
  final case class AInts(v: Seq[Long]) extends AV

  def node(op: String, ins: Seq[String], outName: String,
           attrs: Seq[(String, AV)] = Nil)(w: W): Unit = {
    ins.foreach(w.str(1, _))
    w.str(2, outName)
    w.str(4, op)
    attrs.foreach { case (name, av) =>
      w.msg(5) { a => // NodeProto.attribute
        a.str(1, name)
        av match {
          case AI(v) =>
            // two's-complement varint for negatives (axis = -1)
            a.tag(3, 0); a.varint(v)
            a.int(20, 2L) // AttributeProto.type = INT
          case AF(v) =>
            a.tag(2, 5)
            val bits = java.lang.Float.floatToIntBits(v)
            a.out.write(bits & 0xff); a.out.write((bits >>> 8) & 0xff)
            a.out.write((bits >>> 16) & 0xff); a.out.write((bits >>> 24) & 0xff)
            a.int(20, 1L) // FLOAT
          case AInts(vs) =>
            vs.foreach { v => a.tag(8, 0); a.varint(v) }
            a.int(20, 7L) // INTS
        }
      }
    }
  }

  /** ONE SELF-ATTENTION BLOCK as an ONNX graph — the transformer op set
    * (batched/transposed MatMul, Softmax, attribute-carrying nodes) in the
    * dyadic-weight discipline: after Softmax (the only transcendental
    * stage) the attention weights QUANTIZE to k/1024 via
    * Mul·Floor·Div, so every downstream sum is integer-exact again and
    * the q_onnx_attention DuckDB oracle can replay the block relationally
    * (floor is evaluation-order-free where round-half would not be).
    * scale = 1/sqrt(h) with h = 16, so the scaling is an exact power of
    * two. */
  def attention(table: Array[Float], vocab: Int, h: Int,
                wq: Array[Float], wk: Array[Float], wv: Array[Float],
                wo: Array[Float], dim: Int): Array[Byte] = {
    require(h == 16, "scale 0.25 is exact only for h = 16")
    val w = new W()
    w.msg(7) { g => // ModelProto.graph
      g.msg(1)(node("Gather", Seq("table", "ids"), "x"))
      g.msg(1)(node("MatMul", Seq("x", "wq"), "q"))
      g.msg(1)(node("MatMul", Seq("x", "wk"), "k"))
      g.msg(1)(node("MatMul", Seq("x", "wv"), "v"))
      g.msg(1)(node("Transpose", Seq("k"), "kt", Seq("perm" -> AInts(Seq(1, 0)))))
      g.msg(1)(node("MatMul", Seq("q", "kt"), "s"))
      g.msg(1)(node("Mul", Seq("s", "scale"), "sc"))
      g.msg(1)(node("Softmax", Seq("sc"), "a", Seq("axis" -> AI(-1))))
      g.msg(1)(node("Mul", Seq("a", "c1024"), "a1024"))
      g.msg(1)(node("Floor", Seq("a1024"), "af"))
      g.msg(1)(node("Div", Seq("af", "c1024"), "aq"))
      g.msg(1)(node("MatMul", Seq("aq", "v"), "ctx"))
      g.msg(1)(node("ReduceMean", Seq("ctx"), "pooled",
        Seq("axes" -> AInts(Seq(0)), "keepdims" -> AI(0))))
      g.msg(1)(node("MatMul", Seq("pooled", "wo"), "out"))
      g.msg(5)(floatTensor("table", Seq(vocab, h), table))
      g.msg(5)(floatTensor("wq", Seq(h, h), wq))
      g.msg(5)(floatTensor("wk", Seq(h, h), wk))
      g.msg(5)(floatTensor("wv", Seq(h, h), wv))
      g.msg(5)(floatTensor("wo", Seq(h, dim), wo))
      g.msg(5)(floatTensor("scale", Seq(1), Array(0.25f)))
      g.msg(5)(floatTensor("c1024", Seq(1), Array(1024f)))
      g.msg(11)(v => v.str(1, "ids"))
      g.msg(12)(v => v.str(1, "out"))
    }
    w.out.toByteArray
  }

  /** Embedding-bag encoder graph: Gather(table, ids) → ReduceMean →
    * MatMul+bias → Relu → MatMul. */
  def embeddingBag(table: Array[Float], vocab: Int, hid: Int,
                   w1: Array[Float], mid: Int, b1: Array[Float],
                   w2: Array[Float], dim: Int): Array[Byte] = {
    val w = new W()
    w.msg(7) { g => // ModelProto.graph
      g.msg(1)(node("Gather", Seq("table", "ids"), "gathered"))
      // explicit axes/keepdims: the spec default for an attr-less
      // ReduceMean is reduce-ALL-axes keepdims=1, not the token-axis pool
      g.msg(1)(node("ReduceMean", Seq("gathered"), "pooled",
        Seq("axes" -> AInts(Seq(0)), "keepdims" -> AI(0))))
      g.msg(1)(node("MatMul", Seq("pooled", "w1"), "h"))
      g.msg(1)(node("Add", Seq("h", "b1"), "hb"))
      g.msg(1)(node("Relu", Seq("hb"), "hr"))
      g.msg(1)(node("MatMul", Seq("hr", "w2"), "out"))
      g.msg(5)(floatTensor("table", Seq(vocab, hid), table))
      g.msg(5)(floatTensor("w1", Seq(hid, mid), w1))
      g.msg(5)(floatTensor("b1", Seq(mid), b1))
      g.msg(5)(floatTensor("w2", Seq(mid, dim), w2))
      g.msg(11)(v => v.str(1, "ids"))
      g.msg(12)(v => v.str(1, "out"))
    }
    w.out.toByteArray
  }
}

/**
 * The shipped DEMO ONNX artifact: an embedding-bag encoder with
 * formula-derived DYADIC weights — every cell is k/1024 for an integer
 * k ∈ [-1024, 1024] from the engine's scramble32 recipe (the
 * AnnQueries.plane discipline), which makes the ENTIRE inference pipeline
 * exact in IEEE double: table sums, matmul products (24-bit float ×
 * 11-bit dyadic fits far inside 53 bits), and bias adds all round only at
 * the per-op float cast, identically in any evaluation order. That is
 * what lets q_onnx_embed's DuckDB oracle replay ONNX inference
 * bit-for-bit with plain relational joins — no simulated accumulation
 * order needed.
 */
object OnnxModels {
  val Vocab = 32
  val Hid = 16
  val Mid = 24
  val Dim = 8

  /** Integer weight k at flat index (region-offset + i): scramble32 to
    * [-1024, 1024]. SINGLE SOURCE OF TRUTH — the oracle SQL emits these
    * same integers as VALUES rows. */
  def k(idx: Long): Long = ((idx * 2654435761L) % 4294967296L) % 2049L - 1024L

  private def mat(off: Long, n: Int): Array[Float] =
    Array.tabulate(n)(i => k(off + i).toFloat / 1024f)

  lazy val table: Array[Float] = mat(0L, Vocab * Hid)
  lazy val w1: Array[Float] = mat(100000L, Hid * Mid)
  lazy val b1: Array[Float] = mat(200000L, Mid)
  lazy val w2: Array[Float] = mat(300000L, Mid * Dim)

  lazy val modelBytes: Array[Byte] =
    OnnxWrite.embeddingBag(table, Vocab, Hid, w1, Mid, b1, w2, Dim)

  /** The demo embedder: artifact bytes written once per JVM, then loaded
    * through the real file path ([[OnnxEmbedder]] → once-per-executor
    * cache → batched encode). */
  lazy val embedder: Embedder = {
    val p = java.nio.file.Files.createTempFile("graft_onnx_demo", ".onnx")
    java.nio.file.Files.write(p, modelBytes)
    p.toFile.deleteOnExit()
    OnnxEmbedder(p.toString, Dim)
  }

  /** VALUES rows `(i, k)` for one weight region (oracle-side weights). */
  def valuesSql(off: Long, n: Int): String =
    (0 until n).map(i => s"($i, ${k(off + i)})").mkString(", ")

  // ----------------------------------------------- attention demo model

  /** q_onnx_attention's output width. */
  val AttDim = 8
  /** Weight-region offsets, shared with the oracle's VALUES tables. */
  val WqOff = 400000L
  val WkOff = 500000L
  val WvOff = 600000L
  val WoOff = 700000L

  lazy val wq: Array[Float] = mat(WqOff, Hid * Hid)
  lazy val wk: Array[Float] = mat(WkOff, Hid * Hid)
  lazy val wv: Array[Float] = mat(WvOff, Hid * Hid)
  lazy val wo: Array[Float] = mat(WoOff, Hid * AttDim)

  lazy val attentionModelBytes: Array[Byte] =
    OnnxWrite.attention(table, Vocab, Hid, wq, wk, wv, wo, AttDim)

  /** Self-attention demo embedder over the dyadic artifact; ids are the
    * engine token kernel's hashes mod Vocab (the [[OnnxEmbedder]] id
    * pipeline, pinned explicitly because this graph holds five 2-D
    * tables). */
  lazy val attentionEmbedder: Embedder = {
    val p = java.nio.file.Files.createTempFile("graft_onnx_attn", ".onnx")
    java.nio.file.Files.write(p, attentionModelBytes)
    p.toFile.deleteOnExit()
    val path = p.toString
    new BatchedModelEmbedder[Onnx.Graph](
      name = s"onnx-attn:$path",
      dim = AttDim,
      loadModel = () => Onnx.parseModel(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))),
      encodeBatch = (g, texts) => texts.map { t =>
        val toks = TextHashOps.tokenize(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        val ids = Array.tabulate(toks.numElements()) { i =>
          TextHashOps.polyHash(toks.getUTF8String(i)) % Vocab
        }
        Onnx.run(g, Onnx.Tensor.ofLongs(Array(ids.length), ids)).data
      })
  }
}
