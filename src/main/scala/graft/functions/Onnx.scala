package graft.functions

/**
 * Minimal ONNX model LOADER + EVALUATOR — the real-weights slot of the
 * [[BatchedModelEmbedder]] seam (the reference encodes with
 * SentenceTransformer MiniLM, /root/reference/src/embeddings.py:3-6; its
 * deployable form is an ONNX artifact). Zero dependencies: ONNX is
 * protobuf, and the wire format is three primitives (varint, 64-bit,
 * length-delimited), so a ~100-line reader covers the subset an
 * inference-only embedding graph needs — ModelProto.graph, the
 * initializer tensors, the node list, and the input/output names.
 *
 * The evaluator executes the graph as a straight-line program over named
 * tensors (ONNX graphs are topologically sorted by spec) and supports the
 * operator set of an embedding-bag encoder: Gather (axis 0), ReduceMean
 * (axis 0/1 with keepdims=0), MatMul, Add, Relu, Identity. That covers
 * "embedding lookup → mean pool → dense projection (+bias, activation)"
 * — the pooling half of a sentence-transformer; full attention stacks
 * need a real runtime and stay out of scope for a zero-dependency JVM
 * build, which is exactly why the seam exists.
 *
 * Tokenization contract: [[OnnxEmbedder]] feeds the engine-wide token
 * kernel's hashes (mod the artifact's vocab) as the id sequence — the
 * artifact supplies LEARNED weights; a WordPiece vocab file would slot
 * into the same id pipeline.
 */
object Onnx {

  // ------------------------------------------------------------ tensors

  /** Row-major tensor; float payload, with int64 payloads (Gather
    * indices) carried exactly in `longs`. */
  final case class Tensor(dims: Array[Int], data: Array[Float],
                          longs: Array[Long] = null) {
    def size: Int = dims.product
    def isInt: Boolean = longs != null
  }

  object Tensor {
    def ofLongs(dims: Array[Int], v: Array[Long]): Tensor =
      Tensor(dims, null, v)
  }

  // ----------------------------------------------------- protobuf reader

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def tag(): (Int, Int) = { val t = varint().toInt; (t >>> 3, t & 7) }
    def bytes(): (Int, Int) = { // (offset, length) view — no copy
      val len = varint().toInt
      val off = pos
      pos += len
      (off, len)
    }
    def sub(): Reader = { val (off, len) = bytes(); new Reader(buf, off, off + len) }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => bytes(): Unit
      case 5 => pos += 4
      case w => sys.error(s"unsupported wire type $w")
    }
    def utf8(): String = {
      val (off, len) = bytes()
      new String(buf, off, len, java.nio.charset.StandardCharsets.UTF_8)
    }
    def raw(): Array[Byte] = {
      val (off, len) = bytes()
      java.util.Arrays.copyOfRange(buf, off, off + len)
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
  }

  final case class Node(op: String, inputs: Seq[String], outputs: Seq[String])

  final case class Graph(nodes: Seq[Node], inits: Map[String, Tensor],
                         inputName: String, outputName: String)

  /** Parse a serialized ModelProto (the subset above). */
  def parseModel(bytes: Array[Byte]): Graph = {
    val r = new Reader(bytes, 0, bytes.length)
    var g: Graph = null
    while (r.hasMore) r.tag() match {
      case (7, 2) => g = parseGraph(r.sub()) // ModelProto.graph
      case (_, w) => r.skip(w)
    }
    require(g != null, "ModelProto has no graph")
    g
  }

  private def parseGraph(r: Reader): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    var input: String = null
    var output: String = null
    val initNames = scala.collection.mutable.HashSet.empty[String]
    val pendingInputs = Seq.newBuilder[String]
    while (r.hasMore) r.tag() match {
      case (1, 2) => nodes += parseNode(r.sub()) // GraphProto.node
      case (5, 2) => // GraphProto.initializer
        val (name, t) = parseTensor(r.sub())
        initNames += name
        inits += ((name, t))
      case (11, 2) => pendingInputs += parseValueInfoName(r.sub()) // input
      case (12, 2) => if (output == null) output = parseValueInfoName(r.sub())
      case (_, w) => r.skip(w)
    }
    // the graph INPUT is the first declared input that is not an
    // initializer (ONNX lists weights as inputs in older opsets)
    input = pendingInputs.result().find(!initNames(_)).orNull
    require(input != null && output != null, "graph needs an input and an output")
    Graph(nodes.result(), inits.result(), input, output)
  }

  private def parseNode(r: Reader): Node = {
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    var op = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => ins += r.utf8() // NodeProto.input
      case (2, 2) => outs += r.utf8() // NodeProto.output
      case (4, 2) => op = r.utf8() // NodeProto.op_type
      case (_, w) => r.skip(w)
    }
    Node(op, ins.result(), outs.result())
  }

  /** TensorProto: dims=1, data_type=2, float_data=4, int64_data=7,
    * name=8, raw_data=9. Types: 1=float32, 7=int64. */
  private def parseTensor(r: Reader): (String, Tensor) = {
    val dims = Seq.newBuilder[Int]
    var dtype = 1
    var name = ""
    val floats = Seq.newBuilder[Float]
    val longs = Seq.newBuilder[Long]
    var rawData: Array[Byte] = null
    while (r.hasMore) r.tag() match {
      case (1, 0) => dims += r.varint().toInt
      case (1, 2) => // packed dims
        val s = r.sub(); while (s.hasMore) dims += s.varint().toInt
      case (2, 0) => dtype = r.varint().toInt
      case (4, 5) =>
        floats += java.lang.Float.intBitsToFloat(r.fixed32())
      case (4, 2) => // packed float_data
        val s = r.sub()
        while (s.hasMore) floats += java.lang.Float.intBitsToFloat(s.fixed32())
      case (7, 0) => longs += r.varint()
      case (7, 2) => { val s = r.sub(); while (s.hasMore) longs += s.varint() }
      case (8, 2) => name = r.utf8()
      case (9, 2) => rawData = r.raw()
      case (_, w) => r.skip(w)
    }
    val d = dims.result().toArray
    val t = dtype match {
      case 1 =>
        val f =
          if (rawData != null) {
            val bb = java.nio.ByteBuffer.wrap(rawData)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            Array.fill(rawData.length / 4)(bb.getFloat())
          } else floats.result().toArray
        Tensor(d, f)
      case 7 =>
        val l =
          if (rawData != null) {
            val bb = java.nio.ByteBuffer.wrap(rawData)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            Array.fill(rawData.length / 8)(bb.getLong())
          } else longs.result().toArray
        Tensor.ofLongs(d, l)
      case other => sys.error(s"unsupported tensor data_type $other")
    }
    (name, t)
  }

  private def parseValueInfoName(r: Reader): String = {
    var name = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => name = r.utf8() // ValueInfoProto.name
      case (_, w) => r.skip(w)
    }
    name
  }

  // ------------------------------------------------------------ evaluate

  /** Execute the graph on one input tensor. Straight-line interpretation:
    * each node reads named tensors and binds its output; ONNX graphs are
    * topologically sorted by spec. */
  def run(g: Graph, input: Tensor): Tensor = {
    val env = scala.collection.mutable.HashMap[String, Tensor](g.inits.toSeq: _*)
    env(g.inputName) = input
    g.nodes.foreach { n =>
      val out = n.op match {
        case "Identity" => env(n.inputs.head)
        case "Relu" =>
          val a = env(n.inputs.head)
          Tensor(a.dims, a.data.map(v => if (v > 0f) v else 0f))
        case "Add" => add(env(n.inputs(0)), env(n.inputs(1)))
        case "MatMul" => matmul(env(n.inputs(0)), env(n.inputs(1)))
        case "Gather" => gather(env(n.inputs(0)), env(n.inputs(1)))
        case "ReduceMean" => reduceMeanAxis0(env(n.inputs.head))
        case other => sys.error(s"unsupported op $other")
      }
      env(n.outputs.head) = out
    }
    env.getOrElse(g.outputName,
      sys.error(s"graph never produced output ${g.outputName}"))
  }

  /** [n, d] x [d, m] -> [n, m]; a rank-1 left side is treated as [1, d]. */
  private def matmul(a: Tensor, b: Tensor): Tensor = {
    val (n, d) = if (a.dims.length == 1) (1, a.dims(0)) else (a.dims(0), a.dims(1))
    require(b.dims.length == 2 && b.dims(0) == d,
      s"matmul shape mismatch: ${a.dims.toSeq} x ${b.dims.toSeq}")
    val m = b.dims(1)
    val out = new Array[Float](n * m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += a.data(i * d + k).toDouble * b.data(k * m + j); k += 1 }
        out(i * m + j) = acc.toFloat
        j += 1
      }
      i += 1
    }
    Tensor(if (a.dims.length == 1) Array(m) else Array(n, m), out)
  }

  /** Elementwise with row-broadcast: [n, m] + [m] (bias) or same-shape. */
  private def add(a: Tensor, b: Tensor): Tensor =
    if (a.size == b.size)
      Tensor(a.dims, Array.tabulate(a.size)(i => a.data(i) + b.data(i)))
    else {
      val m = b.size
      require(a.size % m == 0, s"add broadcast mismatch ${a.dims.toSeq}+${b.dims.toSeq}")
      Tensor(a.dims, Array.tabulate(a.size)(i => a.data(i) + b.data(i % m)))
    }

  /** Gather rows (axis 0): data [v, d], int64 indices [n] -> [n, d]. */
  private def gather(data: Tensor, idx: Tensor): Tensor = {
    require(idx.isInt, "Gather indices must be int64")
    require(data.dims.length == 2, "Gather expects a 2-D table")
    val d = data.dims(1)
    val n = idx.longs.length
    val out = new Array[Float](n * d)
    var i = 0
    while (i < n) {
      val row = idx.longs(i).toInt
      System.arraycopy(data.data, row * d, out, i * d, d)
      i += 1
    }
    Tensor(Array(n, d), out)
  }

  /** Mean over axis 0 with keepdims=0: [n, d] -> [d]. Empty input pools
    * to zeros (an empty text must embed, not crash). */
  private def reduceMeanAxis0(a: Tensor): Tensor = {
    require(a.dims.length == 2, "ReduceMean expects 2-D input")
    val n = a.dims(0); val d = a.dims(1)
    val out = new Array[Float](d)
    if (n > 0) {
      val acc = new Array[Double](d)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < d) { acc(j) += a.data(i * d + j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < d) { out(j) = (acc(j) / n).toFloat; j += 1 }
    }
    Tensor(Array(d), out)
  }
}

/** [[Embedder]] over an ONNX artifact through the [[BatchedModelEmbedder]]
  * seam: the model file loads ONCE per executor JVM (the seam's cache),
  * texts encode in executor-side batches, and [[Embedder.embedOne]] gives
  * the driver loop the same kernel. The graph contract: input = int64 id
  * sequence [n], output = float vector [dim] (or [1, dim]); ids are the
  * engine token kernel's hashes mod `vocab` (the Gather table's row
  * count), so the artifact's embedding table is addressed exactly like
  * [[WeightFileEmbedder]]'s bucket rows. */
object OnnxEmbedder {
  val EnvVar = "GRAFT_ONNX_MODEL"

  def apply(path: String, dim: Int, batchSize: Int = 64): Embedder = {
    new BatchedModelEmbedder[Onnx.Graph](
      name = s"onnx:$path",
      dim = dim,
      loadModel = () => Onnx.parseModel(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))),
      encodeBatch = (g, texts) => texts.map(t => encodeOne(g, t, dim)),
      batchSize = batchSize)
  }

  private[functions] def encodeOne(g: Onnx.Graph, text: String, dim: Int): Array[Float] = {
    val vocab = g.inits.valuesIterator
      .collectFirst { case t if t.dims.length == 2 && !t.isInt => t.dims(0) }
      .getOrElse(sys.error("artifact has no 2-D embedding table"))
    val toks = TextHashOps.tokenize(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    val ids = Array.tabulate(toks.numElements()) { i =>
      TextHashOps.polyHash(toks.getUTF8String(i)) % vocab
    }
    val out = Onnx.run(g, Onnx.Tensor.ofLongs(Array(ids.length), ids))
    require(out.size == dim,
      s"artifact produced ${out.size} dims, embedder constructed with $dim")
    out.data
  }

  /** Env wiring like [[WeightFileEmbedder.fromEnv]]: `GRAFT_ONNX_MODEL` =
    * `<path>:<dim>`. */
  def fromEnv(): Option[Embedder] = sys.env.get(EnvVar).map { v =>
    val i = v.lastIndexOf(':')
    apply(v.substring(0, i), v.substring(i + 1).toInt)
  }
}
