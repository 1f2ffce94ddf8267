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

  def node(op: String, ins: Seq[String], outName: String)(w: W): Unit = {
    ins.foreach(w.str(1, _))
    w.str(2, outName)
    w.str(4, op)
  }

  /** Embedding-bag encoder graph: Gather(table, ids) → ReduceMean →
    * MatMul+bias → Relu → MatMul. */
  def embeddingBag(table: Array[Float], vocab: Int, hid: Int,
                   w1: Array[Float], mid: Int, b1: Array[Float],
                   w2: Array[Float], dim: Int): Array[Byte] = {
    val w = new W()
    w.msg(7) { g => // ModelProto.graph
      g.msg(1)(node("Gather", Seq("table", "ids"), "gathered"))
      g.msg(1)(node("ReduceMean", Seq("gathered"), "pooled"))
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
}
