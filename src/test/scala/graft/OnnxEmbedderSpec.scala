package graft

import graft.functions.{Onnx, OnnxEmbedder, TextHashOps}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hermetic protobuf WRITER for a tiny ONNX embedding model — the test
 * generates the artifact it loads (no external files, the
 * WeightFileEmbedder discipline), byte-level per the protobuf wire
 * format, so [[Onnx.parseModel]] is exercised against independently
 * produced bytes rather than its own writer.
 */
object TinyOnnx {
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
    def msg(field: Int)(build: W => Unit): Unit = {
      val w = new W(); build(w); bytes(field, w.out.toByteArray)
    }
  }

  private def floatTensor(name: String, dims: Seq[Int], data: Array[Float])(w: W): Unit = {
    dims.foreach(d => w.int(1, d.toLong))
    w.int(2, 1L) // data_type = FLOAT
    val bb = java.nio.ByteBuffer.allocate(4 * data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putFloat)
    w.bytes(9, bb.array()) // raw_data
    w.str(8, name)
  }

  private def node(op: String, ins: Seq[String], outName: String)(w: W): Unit = {
    ins.foreach(w.str(1, _))
    w.str(2, outName)
    w.str(4, op)
  }

  /** Token-axis mean with EXPLICIT spec attrs (axes=[0], keepdims=0) —
    * an attr-less ReduceMean means reduce-ALL-axes per the ONNX spec. */
  private def reduceMeanAxis0(in: String, outName: String)(w: W): Unit = {
    w.str(1, in)
    w.str(2, outName)
    w.str(4, "ReduceMean")
    w.msg(5) { a => a.str(1, "axes"); a.int(8, 0L); a.int(20, 7L) }
    w.msg(5) { a => a.str(1, "keepdims"); a.int(3, 0L); a.int(20, 2L) }
  }

  /** Embedding-bag encoder: Gather(table, ids) → ReduceMean → MatMul+bias
    * → Relu → MatMul. Deterministic pseudo-random weights from `seed`. */
  def model(vocab: Int, hid: Int, mid: Int, dim: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    def mat(n: Int, m: Int) = Array.fill(n * m)((rnd.nextDouble() * 2 - 1).toFloat)
    val (table, w1, b1, w2) = (mat(vocab, hid), mat(hid, mid), mat(1, mid), mat(mid, dim))
    val w = new W()
    w.msg(7) { g => // ModelProto.graph
      g.msg(1)(node("Gather", Seq("table", "ids"), "gathered"))
      g.msg(1)(reduceMeanAxis0("gathered", "pooled"))
      g.msg(1)(node("MatMul", Seq("pooled", "w1"), "h"))
      g.msg(1)(node("Add", Seq("h", "b1"), "hb"))
      g.msg(1)(node("Relu", Seq("hb"), "hr"))
      g.msg(1)(node("MatMul", Seq("hr", "w2"), "out"))
      g.msg(5)(floatTensor("table", Seq(vocab, hid), table))
      g.msg(5)(floatTensor("w1", Seq(hid, mid), w1))
      g.msg(5)(floatTensor("b1", Seq(mid), b1))
      g.msg(5)(floatTensor("w2", Seq(mid, dim), w2))
      g.msg(11)(v => v.str(1, "ids")) // graph input (non-initializer)
      g.msg(12)(v => v.str(1, "out")) // graph output
    }
    w.out.toByteArray
  }

  /** Independent reference computation with the SAME seed-derived weights
    * — validates the whole load+execute path, not just self-consistency. */
  def reference(vocab: Int, hid: Int, mid: Int, dim: Int, seed: Int,
                text: String): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    def mat(n: Int, m: Int) = Array.fill(n * m)((rnd.nextDouble() * 2 - 1).toFloat)
    val (table, w1, b1, w2) = (mat(vocab, hid), mat(hid, mid), mat(1, mid), mat(mid, dim))
    val toks = TextHashOps.tokenize(UTF8String.fromString(text))
    val ids = Array.tabulate(toks.numElements())(i =>
      (TextHashOps.polyHash(toks.getUTF8String(i)) % vocab).toInt)
    val pooled = new Array[Double](hid)
    ids.foreach { id =>
      var j = 0
      while (j < hid) { pooled(j) += table(id * hid + j); j += 1 }
    }
    if (ids.nonEmpty) (0 until hid).foreach(j => pooled(j) /= ids.length)
    val hr = Array.tabulate(mid) { j =>
      var acc = 0.0
      (0 until hid).foreach(k => acc += pooled(k).toFloat.toDouble * w1(k * mid + j))
      val v = (acc.toFloat + b1(j))
      if (v > 0f) v else 0f
    }
    Array.tabulate(dim) { j =>
      var acc = 0.0
      (0 until mid).foreach(k => acc += hr(k).toDouble * w2(k * dim + j))
      acc.toFloat
    }
  }
}

class OnnxEmbedderSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val (vocab, hid, mid, dim, seed) = (32, 16, 24, 8, 7)

  private def writeModel(): String = {
    val p = java.nio.file.Files.createTempFile("graft_tiny", ".onnx")
    java.nio.file.Files.write(p, TinyOnnx.model(vocab, hid, mid, dim, seed))
    p.toString
  }

  test("parse + execute a generated ONNX artifact matches an independent reference") {
    val path = writeModel()
    val emb = OnnxEmbedder(path, dim)
    for (t <- Seq("the quick brown fox", "vector stores encrypt rows",
        "a", "", "repeat repeat repeat")) {
      val got = emb.embedOne(t).toSeq
      val want = TinyOnnx.reference(vocab, hid, mid, dim, seed, t).toSeq
      assert(got.zip(want).forall { case (a, b) => math.abs(a - b) < 1e-5f },
        s"mismatch on '$t': $got vs $want")
    }
  }

  test("column path: batched executor-side encode equals embedOne row for row") {
    val path = writeModel()
    val emb = OnnxEmbedder(path, dim, batchSize = 4)
    val docs = (1 to 10).map(i => (i.toLong, s"document number $i about topic ${i % 3}"))
      .toDF("id", "text")
    val out = emb.embed(docs, "text", "emb")
      .select(col("id"), col("text"), col("emb")).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getSeq[Float](2).toSeq == emb.embedOne(r.getString(1)).toSeq,
        s"row ${r.getLong(0)} diverges from the driver kernel")
    }
  }

  test("the artifact loads ONCE per JVM: embedding works after the file is deleted") {
    val path = writeModel()
    val emb = OnnxEmbedder(path, dim)
    val first = emb.embedOne("warm the cache").toSeq
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    // a second encode (and a column pass) must hit the executor-JVM cache,
    // not the deleted file
    assert(emb.embedOne("warm the cache").toSeq == first)
    val docs = Seq((1L, "still works")).toDF("id", "text")
    assert(emb.embed(docs, "text", "emb").count() == 1)
  }

  test("q_embed_knn's pipeline runs through the ONNX seam unchanged") {
    val path = writeModel()
    val emb = OnnxEmbedder(path, dim)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = graft.functions.Embedder.knnByText(docs, "doc_id", "text", 0, 5, emb)
      .collect()
    assert(got.length == 5 && got.forall(_.getLong(0) != 0L))
  }
}
