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
 * TRANSFORMER-ENCODER operator set — what a BERT-family export (the
 * reference's all-MiniLM-L6-v2, /root/reference/src/embeddings.py:3)
 * actually contains: batched MatMul/Gemm, Transpose, Softmax,
 * LayerNormalization (+ its ReduceMean/Sub/Pow/Sqrt/Div decomposition),
 * Erf/Gelu/Tanh/Sigmoid/Relu, elementwise arithmetic with full numpy
 * broadcasting, and the shape machinery real exports are wrapped in
 * (Shape/Reshape/Concat/Unsqueeze/Squeeze/Slice/Expand/Cast/Constant/
 * ConstantOfShape/Where/Equal), over float32 and int64 tensors. The
 * embedding-bag subset of earlier rounds (Gather/ReduceMean/MatMul/Add/
 * Relu) is otherwise unchanged, with ONE spec-alignment break: attr-less
 * ReduceMean now reduces ALL axes with keepdims=1 (the ONNX default)
 * instead of the old axis-0/keepdims=0 carve-out, so a pre-r9 .onnx
 * artifact that relied on the old default (e.g. an external
 * GRAFT_ONNX_MODEL file) fails loudly at the following MatMul's shape
 * check and must be re-exported with explicit axes/keepdims attributes
 * (the in-tree writer has emitted them explicitly since the same change;
 * it regenerates its artifact bytes per JVM, so nothing in-tree persists
 * the old encoding).
 *
 * Tokenization contract: [[OnnxEmbedder]] feeds the engine-wide token
 * kernel's hashes (mod the artifact's vocab) as the id sequence;
 * [[OnnxTransformerEmbedder]] feeds real WordPiece ids ([[WordPiece]])
 * through the BERT input triple (input_ids / attention_mask /
 * token_type_ids) and mean-pools the hidden states — the
 * sentence-transformers recipe.
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

  /** ONNX node attribute — the subset inference graphs carry: single
    * int/float, int list, embedded tensor (Constant / ConstantOfShape). */
  final case class Attr(i: Option[Long] = None, f: Option[Float] = None,
                        ints: Seq[Long] = Nil, t: Option[Tensor] = None)

  final case class Node(op: String, inputs: Seq[String], outputs: Seq[String],
                        attrs: Map[String, Attr] = Map.empty) {
    def attrI(name: String, dflt: Long): Long =
      attrs.get(name).flatMap(_.i).getOrElse(dflt)
    def attrF(name: String, dflt: Float): Float =
      attrs.get(name).flatMap(_.f).getOrElse(dflt)
    def attrInts(name: String): Option[Seq[Long]] =
      attrs.get(name).map(a => if (a.ints.nonEmpty) a.ints else a.i.toSeq)
  }

  /** `inputName`/`outputName` keep the single-input embedding-bag contract;
    * `inputNames` carries every non-initializer graph input in declaration
    * order (a BERT export declares three). */
  final case class Graph(nodes: Seq[Node], inits: Map[String, Tensor],
                         inputName: String, outputName: String,
                         inputNames: Seq[String] = Nil)

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
    // the graph INPUTS are the declared inputs that are not initializers
    // (ONNX lists weights as inputs in older opsets)
    val realInputs = pendingInputs.result().filterNot(initNames)
    input = realInputs.headOption.orNull
    require(input != null && output != null, "graph needs an input and an output")
    Graph(nodes.result(), inits.result(), input, output, realInputs)
  }

  private def parseNode(r: Reader): Node = {
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    val attrs = Map.newBuilder[String, Attr]
    var op = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => ins += r.utf8() // NodeProto.input
      case (2, 2) => outs += r.utf8() // NodeProto.output
      case (4, 2) => op = r.utf8() // NodeProto.op_type
      case (5, 2) => attrs += parseAttr(r.sub()) // NodeProto.attribute
      case (_, w) => r.skip(w)
    }
    Node(op, ins.result(), outs.result(), attrs.result())
  }

  /** AttributeProto: name=1, f=2, i=3, t=5, ints=8 (the inference subset;
    * strings/graphs/typed lists skip). */
  private def parseAttr(r: Reader): (String, Attr) = {
    var name = ""
    var a = Attr()
    while (r.hasMore) r.tag() match {
      case (1, 2) => name = r.utf8()
      case (2, 5) => a = a.copy(f = Some(java.lang.Float.intBitsToFloat(r.fixed32())))
      case (3, 0) =>
        // protobuf int64 is two's-complement varint — sign-extend
        a = a.copy(i = Some(r.varint()))
      case (5, 2) => a = a.copy(t = Some(parseTensor(r.sub())._2))
      case (8, 0) => a = a.copy(ints = a.ints :+ r.varint())
      case (8, 2) =>
        val s = r.sub()
        val b = Seq.newBuilder[Long]
        while (s.hasMore) b += s.varint()
        a = a.copy(ints = a.ints ++ b.result())
      case (_, w) => r.skip(w)
    }
    (name, a)
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

  /** Single-input convenience (the embedding-bag contract). */
  def run(g: Graph, input: Tensor): Tensor = run(g, Map(g.inputName -> input))

  /** Execute the graph on named input tensors. Straight-line
    * interpretation: each node reads named tensors and binds its outputs;
    * ONNX graphs are topologically sorted by spec. */
  def run(g: Graph, inputs: Map[String, Tensor]): Tensor = {
    val env = scala.collection.mutable.HashMap[String, Tensor](g.inits.toSeq: _*)
    inputs.foreach { case (k, v) => env(k) = v }
    def in(n: Node, i: Int): Tensor = env.getOrElse(n.inputs(i),
      sys.error(s"${n.op}: input '${n.inputs(i)}' never produced"))
    def inOpt(n: Node, i: Int): Option[Tensor] =
      if (n.inputs.length > i && n.inputs(i).nonEmpty) Some(in(n, i)) else None
    g.nodes.foreach { n =>
      // the one multi-output op inference encoders carry (fused-QKV
      // exports split one projection into three): bind every output
      if (n.op == "Split") {
        n.outputs.zip(split(n, in(n, 0), inOpt(n, 1)))
          .foreach { case (name, t) => env(name) = t }
      } else {
      val out = n.op match {
        case "Identity" => in(n, 0)
        case "Relu" => mapF(in(n, 0))(v => math.max(v, 0.0))
        case "Tanh" => mapF(in(n, 0))(math.tanh)
        case "Sigmoid" => mapF(in(n, 0))(v => 1.0 / (1.0 + math.exp(-v)))
        case "Sqrt" => mapF(in(n, 0))(math.sqrt)
        case "Neg" =>
          val a = in(n, 0)
          if (a.isInt) Tensor.ofLongs(a.dims, a.longs.map(-_)) else mapF(a)(-_)
        case "Erf" => mapF(in(n, 0))(erf)
        case "Gelu" => // exact (erf) form; 'approximate' attr is a string and
          // HF exports decompose the tanh variant into primitives anyway
          mapF(in(n, 0))(x => 0.5 * x * (1.0 + erf(x / math.sqrt(2.0))))
        case "Floor" => mapF(in(n, 0))(math.floor)
        case "Round" => mapF(in(n, 0))(math.rint) // ONNX: half to even
        case "Add" => binary(n.op, in(n, 0), in(n, 1))(_ + _)(_ + _)
        case "Sub" => binary(n.op, in(n, 0), in(n, 1))(_ - _)(_ - _)
        case "Mul" => binary(n.op, in(n, 0), in(n, 1))(_ * _)(_ * _)
        case "Div" => binary(n.op, in(n, 0), in(n, 1))(_ / _)(_ / _)
        case "Pow" => binary(n.op, in(n, 0), in(n, 1))(math.pow)((a, b) =>
          math.pow(a.toDouble, b.toDouble).toLong)
        case "Min" => n.inputs.map(env(_)).reduceLeft((a, b) =>
          binary("Min", a, b)(math.min)(math.min))
        case "Max" => n.inputs.map(env(_)).reduceLeft((a, b) =>
          binary("Max", a, b)(math.max)(math.max))
        case "Equal" => compare(in(n, 0), in(n, 1))(_ == _)(_ == _)
        case "Greater" => compare(in(n, 0), in(n, 1))(_ > _)(_ > _)
        case "Less" => compare(in(n, 0), in(n, 1))(_ < _)(_ < _)
        case "Where" => where(in(n, 0), in(n, 1), in(n, 2))
        case "Range" => range(in(n, 0), in(n, 1), in(n, 2))
        case "MatMul" => matmul(in(n, 0), in(n, 1))
        case "Gemm" => gemm(n, in(n, 0), in(n, 1), inOpt(n, 2))
        case "Gather" => gather(in(n, 0), in(n, 1), n.attrI("axis", 0).toInt)
        case "ReduceMean" => reduce(n, in(n, 0), inOpt(n, 1), mean = true)
        case "ReduceSum" => reduce(n, in(n, 0), inOpt(n, 1), mean = false)
        case "Softmax" => softmax(in(n, 0), n.attrI("axis", -1).toInt)
        case "LayerNormalization" =>
          layerNorm(in(n, 0), in(n, 1), inOpt(n, 2),
            n.attrI("axis", -1).toInt, n.attrF("epsilon", 1e-5f))
        case "Transpose" => transpose(in(n, 0), n.attrInts("perm"))
        case "Shape" => shapeOf(in(n, 0), n)
        case "Reshape" => reshape(in(n, 0), in(n, 1))
        case "Concat" => concat(n.inputs.map(env(_)), n.attrI("axis", 0).toInt)
        case "Unsqueeze" => unsqueeze(in(n, 0), axesOf(n, inOpt(n, 1)))
        case "Squeeze" => squeeze(in(n, 0), axesOf(n, inOpt(n, 1)))
        case "Slice" => slice(in(n, 0), in(n, 1), in(n, 2), inOpt(n, 3), inOpt(n, 4))
        case "Expand" => expand(in(n, 0), in(n, 1))
        case "Cast" => cast(in(n, 0), n.attrI("to", 1).toInt)
        case "Constant" => constant(n)
        case "ConstantOfShape" => constantOfShape(n, in(n, 0))
        case other => sys.error(s"unsupported op $other")
      }
      env(n.outputs.head) = out
      }
    }
    env.getOrElse(g.outputName,
      sys.error(s"graph never produced output ${g.outputName}"))
  }

  // ------------------------------------------------------ op kernels

  /** Abramowitz & Stegun 7.1.26 — max abs error 1.5e-7, far inside
    * float32's output granularity. */
  private[functions] def erf(x: Double): Double = {
    val sign = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-ax * ax)
    sign * y
  }

  private def mapF(a: Tensor)(f: Double => Double): Tensor = {
    require(!a.isInt, "elementwise float op on an int64 tensor")
    Tensor(a.dims, a.data.map(v => f(v.toDouble).toFloat))
  }

  // -------- broadcasting (numpy rules: align right, 1s stretch)

  private def bcastDims(a: Array[Int], b: Array[Int], op: String): Array[Int] = {
    val r = math.max(a.length, b.length)
    Array.tabulate(r) { i =>
      val ad = if (i + a.length - r >= 0) a(i + a.length - r) else 1
      val bd = if (i + b.length - r >= 0) b(i + b.length - r) else 1
      require(ad == bd || ad == 1 || bd == 1,
        s"$op broadcast mismatch: ${a.toSeq} vs ${b.toSeq}")
      math.max(ad, bd)
    }
  }

  /** Flat index into `src` (dims right-aligned against `out`, 1s repeat)
    * for the multi-index `ix` of the output. */
  private def srcFlat(ix: Array[Int], outRank: Int, src: Array[Int]): Int = {
    var flat = 0
    var i = 0
    val off = outRank - src.length
    while (i < src.length) {
      val d = if (src(i) == 1) 0 else ix(off + i)
      flat = flat * src(i) + d
      i += 1
    }
    flat
  }

  /** Iterate output multi-indices of `dims`, calling f(flatOut, ix). */
  private def eachIndex(dims: Array[Int])(f: (Int, Array[Int]) => Unit): Unit = {
    val n = dims.product
    val ix = new Array[Int](dims.length)
    var flat = 0
    while (flat < n) {
      f(flat, ix)
      var d = dims.length - 1
      var carry = true
      while (d >= 0 && carry) {
        ix(d) += 1
        if (ix(d) == dims(d)) ix(d) = 0 else carry = false
        d -= 1
      }
      flat += 1
    }
  }

  /** Elementwise binary with full broadcast; float pairs run `ff` (double
    * accumulate, float cast), int64 pairs run `lf` (shape arithmetic). */
  private def binary(op: String, a: Tensor, b: Tensor)
                    (ff: (Double, Double) => Double)
                    (lf: (Long, Long) => Long): Tensor = {
    require(a.isInt == b.isInt, s"$op: mixed float/int64 operands (Cast first)")
    val dims = bcastDims(a.dims, b.dims, op)
    if (a.isInt) {
      val out = new Array[Long](dims.product)
      eachIndex(dims) { (flat, ix) =>
        out(flat) = lf(a.longs(srcFlat(ix, dims.length, a.dims)),
          b.longs(srcFlat(ix, dims.length, b.dims)))
      }
      Tensor.ofLongs(dims, out)
    } else {
      val out = new Array[Float](dims.product)
      eachIndex(dims) { (flat, ix) =>
        out(flat) = ff(a.data(srcFlat(ix, dims.length, a.dims)).toDouble,
          b.data(srcFlat(ix, dims.length, b.dims)).toDouble).toFloat
      }
      Tensor(dims, out)
    }
  }

  /** Equal/Greater/Less -> int64 0/1 tensor (ONNX bool carried as int64
    * here), full broadcast. */
  private def compare(a: Tensor, b: Tensor)
                     (fp: (Float, Float) => Boolean)
                     (lp: (Long, Long) => Boolean): Tensor = {
    require(a.isInt == b.isInt, "comparison: mixed float/int64 operands")
    val dims = bcastDims(a.dims, b.dims, "compare")
    val out = new Array[Long](dims.product)
    eachIndex(dims) { (flat, ix) =>
      val hit =
        if (a.isInt) lp(a.longs(srcFlat(ix, dims.length, a.dims)),
          b.longs(srcFlat(ix, dims.length, b.dims)))
        else fp(a.data(srcFlat(ix, dims.length, a.dims)),
          b.data(srcFlat(ix, dims.length, b.dims)))
      out(flat) = if (hit) 1L else 0L
    }
    Tensor.ofLongs(dims, out)
  }

  /** Split along `axis` into |outputs| parts (equal when no sizes input —
    * the fused-QKV export shape). */
  private def split(n: Node, a: Tensor, sizes: Option[Tensor]): Seq[Tensor] = {
    val r = a.dims.length
    val axis = { val x = n.attrI("axis", 0).toInt; if (x < 0) x + r else x }
    val nOut = n.outputs.length
    val parts: Seq[Int] = sizes.map(_.longs.map(_.toInt).toSeq).getOrElse {
      val d = a.dims(axis)
      require(nOut > 0 && d % nOut == 0,
        s"Split: axis extent $d not divisible into $nOut equal parts")
      Seq.fill(nOut)(d / nOut)
    }
    require(parts.sum == a.dims(axis), "Split sizes must cover the axis")
    val inner = a.dims.drop(axis + 1).product
    val outer = a.dims.take(axis).product
    val axLen = a.dims(axis)
    var off = 0
    parts.map { p =>
      val dims = a.dims.clone(); dims(axis) = p
      val t =
        if (a.isInt) {
          val out = new Array[Long](outer * p * inner)
          var o = 0
          while (o < outer) {
            System.arraycopy(a.longs, (o * axLen + off) * inner,
              out, o * p * inner, p * inner)
            o += 1
          }
          Tensor.ofLongs(dims, out)
        } else {
          val out = new Array[Float](outer * p * inner)
          var o = 0
          while (o < outer) {
            System.arraycopy(a.data, (o * axLen + off) * inner,
              out, o * p * inner, p * inner)
            o += 1
          }
          Tensor(dims, out)
        }
      off += p
      t
    }
  }

  /** Range(start, limit, delta) — scalar inputs, 1-D output; int64 when
    * the inputs are (the position-ids shape), float otherwise. */
  private def range(start: Tensor, limit: Tensor, delta: Tensor): Tensor = {
    require(start.isInt == limit.isInt && limit.isInt == delta.isInt,
      "Range: inputs must share a type")
    if (start.isInt) {
      val (s, l, d) = (start.longs(0), limit.longs(0), delta.longs(0))
      require(d != 0, "Range: delta 0")
      val cnt = math.max(0L, ((l - s) + d + (if (d > 0) -1 else 1)) / d).toInt
      Tensor.ofLongs(Array(cnt), Array.tabulate(cnt)(i => s + i * d))
    } else {
      val (s, l, d) = (start.data(0).toDouble, limit.data(0).toDouble,
        delta.data(0).toDouble)
      require(d != 0, "Range: delta 0")
      val cnt = math.max(0L, math.ceil((l - s) / d).toLong).toInt
      Tensor(Array(cnt), Array.tabulate(cnt)(i => (s + i * d).toFloat))
    }
  }

  /** Where(cond != 0, x, y) with three-way broadcast. */
  private def where(c: Tensor, x: Tensor, y: Tensor): Tensor = {
    require(c.isInt, "Where condition must be bool/int64")
    require(x.isInt == y.isInt, "Where branches must share a type")
    val dims = bcastDims(bcastDims(c.dims, x.dims, "Where"), y.dims, "Where")
    if (x.isInt) {
      val out = new Array[Long](dims.product)
      eachIndex(dims) { (flat, ix) =>
        out(flat) =
          if (c.longs(srcFlat(ix, dims.length, c.dims)) != 0L)
            x.longs(srcFlat(ix, dims.length, x.dims))
          else y.longs(srcFlat(ix, dims.length, y.dims))
      }
      Tensor.ofLongs(dims, out)
    } else {
      val out = new Array[Float](dims.product)
      eachIndex(dims) { (flat, ix) =>
        out(flat) =
          if (c.longs(srcFlat(ix, dims.length, c.dims)) != 0L)
            x.data(srcFlat(ix, dims.length, x.dims))
          else y.data(srcFlat(ix, dims.length, y.dims))
      }
      Tensor(dims, out)
    }
  }

  // -------- matmul family

  /** Full ONNX MatMul: rank-1 sides promote ([d]x[d,m], [n,d]x[d]), higher
    * ranks batch with broadcast on the batch dims ([H,n,k]x[H,k,m],
    * [1,H,n,k]x[k,m], ...). Double accumulation, float cast per cell. */
  private def matmul(a: Tensor, b: Tensor): Tensor = {
    require(!a.isInt && !b.isInt, "MatMul is float-only")
    val a2 = if (a.dims.length == 1) Array(1, a.dims(0)) else a.dims
    val b2 = if (b.dims.length == 1) Array(b.dims(0), 1) else b.dims
    val (n, k) = (a2(a2.length - 2), a2(a2.length - 1))
    val (k2, m) = (b2(b2.length - 2), b2(b2.length - 1))
    require(k == k2, s"matmul shape mismatch: ${a.dims.toSeq} x ${b.dims.toSeq}")
    val batch = bcastDims(a2.dropRight(2), b2.dropRight(2), "MatMul")
    val outDims = batch ++ Array(n, m)
    val out = new Array[Float](outDims.product)
    val nb = batch.product.max(1)
    var bi = 0
    // decompose the batch flat index into a multi-index once per matrix
    val bix = new Array[Int](batch.length)
    while (bi < nb) {
      val aOff = srcFlat(bix, batch.length, a2.dropRight(2)) * n * k
      val bOff = srcFlat(bix, batch.length, b2.dropRight(2)) * k2 * m
      val oOff = bi * n * m
      var i = 0
      while (i < n) {
        var j = 0
        while (j < m) {
          var acc = 0.0
          var kk = 0
          while (kk < k) {
            acc += a.data(aOff + i * k + kk).toDouble * b.data(bOff + kk * m + j)
            kk += 1
          }
          out(oOff + i * m + j) = acc.toFloat
          j += 1
        }
        i += 1
      }
      // increment bix
      var d = batch.length - 1
      var carry = true
      while (d >= 0 && carry) {
        bix(d) += 1
        if (bix(d) == batch(d)) bix(d) = 0 else carry = false
        d -= 1
      }
      bi += 1
    }
    val finalDims =
      if (a.dims.length == 1 && b.dims.length == 1) Array(1)
      else if (a.dims.length == 1) outDims.patch(outDims.length - 2, Nil, 1)
      else if (b.dims.length == 1) outDims.dropRight(1)
      else outDims
    Tensor(finalDims, out)
  }

  /** Gemm: alpha * A' x B' + beta * C (C broadcast); 2-D only per spec. */
  private def gemm(n: Node, a0: Tensor, b0: Tensor, c: Option[Tensor]): Tensor = {
    val a = if (n.attrI("transA", 0) == 1L) transpose(a0, Some(Seq(1L, 0L))) else a0
    val b = if (n.attrI("transB", 0) == 1L) transpose(b0, Some(Seq(1L, 0L))) else b0
    val alpha = n.attrF("alpha", 1f).toDouble
    val beta = n.attrF("beta", 1f).toDouble
    val ab = matmul(a, b)
    c match {
      case None => if (alpha == 1.0) ab else mapF(ab)(_ * alpha)
      case Some(cc) =>
        binary("Gemm", if (alpha == 1.0) ab else mapF(ab)(_ * alpha),
          if (beta == 1.0) cc else mapF(cc)(_ * beta))(_ + _)(_ + _)
    }
  }

  // -------- gather / reduce / softmax / layernorm

  /** Gather along `axis`: output = data[:axis] ++ idx.shape ++ data[axis+1:];
    * negative indices wrap. Works for float and int64 data (real exports
    * gather from Shape outputs). */
  private def gather(data: Tensor, idx: Tensor, axis0: Int): Tensor = {
    require(idx.isInt, "Gather indices must be int64")
    val axis = if (axis0 < 0) axis0 + data.dims.length else axis0
    val pre = data.dims.take(axis)
    val post = data.dims.drop(axis + 1)
    val axLen = data.dims(axis)
    val inner = post.product
    val outer = pre.product
    val nIdx = idx.size
    val outDims = pre ++ idx.dims ++ post
    def rows(i: Int): Int = {
      val r = idx.longs(i)
      val w = (if (r < 0) r + axLen else r).toInt
      require(w >= 0 && w < axLen, s"Gather index $r out of range [0,$axLen)")
      w
    }
    if (data.isInt) {
      val out = new Array[Long](outer * nIdx * inner)
      var o = 0
      while (o < outer) {
        var i = 0
        while (i < nIdx) {
          System.arraycopy(data.longs, (o * axLen + rows(i)) * inner,
            out, (o * nIdx + i) * inner, inner)
          i += 1
        }
        o += 1
      }
      Tensor.ofLongs(outDims, out)
    } else {
      val out = new Array[Float](outer * nIdx * inner)
      var o = 0
      while (o < outer) {
        var i = 0
        while (i < nIdx) {
          System.arraycopy(data.data, (o * axLen + rows(i)) * inner,
            out, (o * nIdx + i) * inner, inner)
          i += 1
        }
        o += 1
      }
      Tensor(outDims, out)
    }
  }

  private def axesOf(n: Node, second: Option[Tensor]): Option[Seq[Long]] =
    n.attrInts("axes").orElse(second.map(_.longs.toSeq))

  /** ReduceMean / ReduceSum over `axes` (attr in opset <=17, second input
    * in 18+), keepdims honored; axes absent = reduce ALL axes, keepdims
    * default 1 — the ONNX spec exactly (the pre-r9 embedding-bag
    * carve-out silently shadowed the spec's reduce-all on 2-D input; the
    * shipped artifact writers now emit explicit axes=[0], keepdims=0).
    * Empty reduced extents mean-pool to zeros (an empty text must embed,
    * not crash). */
  private def reduce(n: Node, a: Tensor, second: Option[Tensor],
                     mean: Boolean): Tensor = {
    require(!a.isInt, "Reduce* is float-only here")
    val axesOpt = axesOf(n, second).filter(_.nonEmpty)
    val keep = n.attrI("keepdims", 1) == 1L
    val axes = axesOpt.getOrElse(a.dims.indices.map(_.toLong))
      .map(x => (if (x < 0) x + a.dims.length else x).toInt).toSet
    val outDimsKeep = a.dims.zipWithIndex.map { case (d, i) => if (axes(i)) 1 else d }
    val acc = new Array[Double](outDimsKeep.product)
    val cnt = axes.toSeq.map(a.dims(_)).product.max(1)
    eachIndex(a.dims) { (flat, ix) =>
      acc(srcFlat(ix, a.dims.length, outDimsKeep)) += a.data(flat)
    }
    val out = acc.map(v => (if (mean) v / cnt else v).toFloat)
    val outDims =
      if (keep) outDimsKeep
      else {
        val d = a.dims.zipWithIndex.collect { case (d, i) if !axes(i) => d }
        if (d.isEmpty) Array(1) else d
      }
    Tensor(outDims, out)
  }

  /** Opset-13 Softmax: exp-normalize along `axis` (default last), max
    * subtracted per slice for stability; double accumulation. */
  private def softmax(a: Tensor, axis0: Int): Tensor = {
    require(!a.isInt, "Softmax is float-only")
    val axis = if (axis0 < 0) axis0 + a.dims.length else axis0
    val axLen = a.dims(axis)
    val inner = a.dims.drop(axis + 1).product
    val outer = a.dims.take(axis).product
    val out = new Array[Float](a.size)
    var o = 0
    while (o < outer) {
      var in0 = 0
      while (in0 < inner) {
        val base = o * axLen * inner + in0
        var mx = Double.NegativeInfinity
        var i = 0
        while (i < axLen) {
          mx = math.max(mx, a.data(base + i * inner).toDouble); i += 1
        }
        var sum = 0.0
        val e = new Array[Double](axLen)
        i = 0
        while (i < axLen) {
          e(i) = math.exp(a.data(base + i * inner).toDouble - mx)
          sum += e(i); i += 1
        }
        i = 0
        while (i < axLen) {
          out(base + i * inner) = (e(i) / sum).toFloat; i += 1
        }
        in0 += 1
      }
      o += 1
    }
    Tensor(a.dims, out)
  }

  /** LayerNormalization (opset 17): normalize over dims [axis..rank),
    * scale/bias shaped like the normalized tail. */
  private def layerNorm(x: Tensor, scale: Tensor, bias: Option[Tensor],
                        axis0: Int, eps: Float): Tensor = {
    require(!x.isInt, "LayerNormalization is float-only")
    val axis = if (axis0 < 0) axis0 + x.dims.length else axis0
    val inner = x.dims.drop(axis).product
    val outer = x.dims.take(axis).product
    require(scale.size == inner, s"LayerNorm scale size ${scale.size} != $inner")
    bias.foreach(b => require(b.size == inner, "LayerNorm bias size mismatch"))
    val out = new Array[Float](x.size)
    var o = 0
    while (o < outer) {
      val base = o * inner
      var sum = 0.0
      var i = 0
      while (i < inner) { sum += x.data(base + i); i += 1 }
      val mu = sum / inner
      var varAcc = 0.0
      i = 0
      while (i < inner) {
        val d = x.data(base + i) - mu; varAcc += d * d; i += 1
      }
      val inv = 1.0 / math.sqrt(varAcc / inner + eps)
      i = 0
      while (i < inner) {
        val v = (x.data(base + i) - mu) * inv * scale.data(i) +
          bias.map(_.data(i).toDouble).getOrElse(0.0)
        out(base + i) = v.toFloat
        i += 1
      }
      o += 1
    }
    Tensor(x.dims, out)
  }

  // -------- shape machinery

  private def transpose(a: Tensor, perm0: Option[Seq[Long]]): Tensor = {
    val r = a.dims.length
    val perm = perm0.map(_.map(_.toInt).toArray)
      .getOrElse(Array.tabulate(r)(i => r - 1 - i))
    require(perm.length == r && perm.sorted.sameElements(0 until r),
      s"Transpose perm ${perm.toSeq} invalid for rank $r")
    val outDims = perm.map(a.dims(_))
    val inStrides = new Array[Int](r)
    var s = 1
    var i = r - 1
    while (i >= 0) { inStrides(i) = s; s *= a.dims(i); i -= 1 }
    if (a.isInt) {
      val out = new Array[Long](a.size)
      eachIndex(outDims) { (flat, ix) =>
        var src = 0
        var d = 0
        while (d < r) { src += ix(d) * inStrides(perm(d)); d += 1 }
        out(flat) = a.longs(src)
      }
      Tensor.ofLongs(outDims, out)
    } else {
      val out = new Array[Float](a.size)
      eachIndex(outDims) { (flat, ix) =>
        var src = 0
        var d = 0
        while (d < r) { src += ix(d) * inStrides(perm(d)); d += 1 }
        out(flat) = a.data(src)
      }
      Tensor(outDims, out)
    }
  }

  private def shapeOf(a: Tensor, n: Node): Tensor = {
    val r = a.dims.length
    def clamp(v: Long): Int =
      math.max(0, math.min(r, if (v < 0) v + r else v)).toInt
    val start = clamp(n.attrI("start", 0))
    val end = clamp(n.attrI("end", r))
    Tensor.ofLongs(Array(math.max(0, end - start)),
      a.dims.slice(start, end).map(_.toLong))
  }

  private def reshape(a: Tensor, shape: Tensor): Tensor = {
    require(shape.isInt, "Reshape shape must be int64")
    val spec = shape.longs
    val dims = new Array[Int](spec.length)
    var negAt = -1
    var known = 1L
    var i = 0
    while (i < spec.length) {
      spec(i) match {
        case -1L => require(negAt < 0, "Reshape: multiple -1 dims"); negAt = i
        case 0L => dims(i) = a.dims(i); known *= dims(i)
        case d => dims(i) = d.toInt; known *= d
      }
      i += 1
    }
    if (negAt >= 0) dims(negAt) = (a.size / math.max(known, 1L)).toInt
    require(dims.product == a.size,
      s"Reshape ${a.dims.toSeq} -> ${spec.toSeq}: element count mismatch")
    if (a.isInt) Tensor.ofLongs(dims, a.longs) else Tensor(dims, a.data)
  }

  private def concat(ts: Seq[Tensor], axis0: Int): Tensor = {
    val r = ts.head.dims.length
    val axis = if (axis0 < 0) axis0 + r else axis0
    val outDims = ts.head.dims.clone()
    outDims(axis) = ts.map(_.dims(axis)).sum
    val inner = ts.head.dims.drop(axis + 1).product
    val outer = ts.head.dims.take(axis).product
    if (ts.head.isInt) {
      val out = new Array[Long](outDims.product)
      var o = 0
      while (o < outer) {
        var pos = 0
        ts.foreach { t =>
          val len = t.dims(axis) * inner
          System.arraycopy(t.longs, o * len, out,
            o * outDims(axis) * inner + pos, len)
          pos += len
        }
        o += 1
      }
      Tensor.ofLongs(outDims, out)
    } else {
      val out = new Array[Float](outDims.product)
      var o = 0
      while (o < outer) {
        var pos = 0
        ts.foreach { t =>
          val len = t.dims(axis) * inner
          System.arraycopy(t.data, o * len, out,
            o * outDims(axis) * inner + pos, len)
          pos += len
        }
        o += 1
      }
      Tensor(outDims, out)
    }
  }

  private def unsqueeze(a: Tensor, axes: Option[Seq[Long]]): Tensor = {
    val ax = axes.getOrElse(sys.error("Unsqueeze needs axes")).map(_.toInt)
    val outRank = a.dims.length + ax.length
    val norm = ax.map(x => if (x < 0) x + outRank else x).sorted
    val dims = scala.collection.mutable.ArrayBuffer(a.dims.toSeq: _*)
    norm.foreach(i => dims.insert(i, 1))
    if (a.isInt) Tensor.ofLongs(dims.toArray, a.longs) else Tensor(dims.toArray, a.data)
  }

  private def squeeze(a: Tensor, axes: Option[Seq[Long]]): Tensor = {
    val drop: Set[Int] = axes match {
      case Some(ax) => ax.map(x => (if (x < 0) x + a.dims.length else x).toInt).toSet
      case None => a.dims.zipWithIndex.collect { case (1, i) => i }.toSet
    }
    drop.foreach(i => require(a.dims(i) == 1, s"Squeeze axis $i is ${a.dims(i)}"))
    val dims = a.dims.zipWithIndex.collect { case (d, i) if !drop(i) => d }
    val dd = if (dims.isEmpty) Array(1) else dims
    if (a.isInt) Tensor.ofLongs(dd, a.longs) else Tensor(dd, a.data)
  }

  private def slice(a: Tensor, starts: Tensor, ends: Tensor,
                    axesT: Option[Tensor], stepsT: Option[Tensor]): Tensor = {
    val r = a.dims.length
    val axes = axesT.map(_.longs.map(x => (if (x < 0) x + r else x).toInt))
      .getOrElse(Array.tabulate(starts.longs.length)(identity))
    val steps = stepsT.map(_.longs.map(_.toInt))
      .getOrElse(Array.fill(axes.length)(1))
    val begin = Array.tabulate(r)(_ => 0)
    val stop = a.dims.clone()
    val step = Array.fill(r)(1)
    var i = 0
    while (i < axes.length) {
      val ax = axes(i)
      val dim = a.dims(ax)
      val st = steps(i)
      require(st != 0, "Slice step 0")
      def norm(v: Long, lo: Int, hi: Int): Int = {
        val w = if (v < 0) v + dim else v
        math.max(lo, math.min(hi, w)).toInt
      }
      if (st > 0) {
        begin(ax) = norm(starts.longs(i), 0, dim)
        stop(ax) = norm(ends.longs(i), 0, dim)
      } else {
        begin(ax) = norm(starts.longs(i), 0, dim - 1)
        stop(ax) = math.max(-1, math.min(dim - 1,
          (if (ends.longs(i) < 0) ends.longs(i) + dim else ends.longs(i)))).toInt
      }
      step(ax) = st
      i += 1
    }
    val outDims = Array.tabulate(r) { d =>
      if (step(d) > 0) math.max(0, (stop(d) - begin(d) + step(d) - 1) / step(d))
      else math.max(0, (begin(d) - stop(d) - step(d) - 1) / (-step(d)))
    }
    val inStrides = new Array[Int](r)
    var s = 1
    var d = r - 1
    while (d >= 0) { inStrides(d) = s; s *= a.dims(d); d -= 1 }
    if (a.isInt) {
      val out = new Array[Long](outDims.product)
      eachIndex(outDims) { (flat, ix) =>
        var src = 0
        var dd = 0
        while (dd < r) { src += (begin(dd) + ix(dd) * step(dd)) * inStrides(dd); dd += 1 }
        out(flat) = a.longs(src)
      }
      Tensor.ofLongs(outDims, out)
    } else {
      val out = new Array[Float](outDims.product)
      eachIndex(outDims) { (flat, ix) =>
        var src = 0
        var dd = 0
        while (dd < r) { src += (begin(dd) + ix(dd) * step(dd)) * inStrides(dd); dd += 1 }
        out(flat) = a.data(src)
      }
      Tensor(outDims, out)
    }
  }

  private def expand(a: Tensor, shape: Tensor): Tensor = {
    require(shape.isInt, "Expand shape must be int64")
    val dims = bcastDims(a.dims, shape.longs.map(_.toInt), "Expand")
    if (a.isInt) {
      val out = new Array[Long](dims.product)
      eachIndex(dims)((flat, ix) => out(flat) = a.longs(srcFlat(ix, dims.length, a.dims)))
      Tensor.ofLongs(dims, out)
    } else {
      val out = new Array[Float](dims.product)
      eachIndex(dims)((flat, ix) => out(flat) = a.data(srcFlat(ix, dims.length, a.dims)))
      Tensor(dims, out)
    }
  }

  /** Cast to=1 float; 6/7/9/13 (int32/int64/bool/uint64) -> int64. */
  private def cast(a: Tensor, to: Int): Tensor = to match {
    case 1 | 11 =>
      if (a.isInt) Tensor(a.dims, a.longs.map(_.toFloat)) else a
    case 6 | 7 | 9 | 13 =>
      if (a.isInt) a
      else Tensor.ofLongs(a.dims, a.data.map(v =>
        if (to == 9) (if (v != 0f) 1L else 0L) else v.toLong))
    case other => sys.error(s"unsupported Cast target $other")
  }

  private def constant(n: Node): Tensor =
    n.attrs.get("value").flatMap(_.t)
      .orElse(n.attrs.get("value_int").flatMap(_.i)
        .map(v => Tensor.ofLongs(Array(1), Array(v))))
      .orElse(n.attrs.get("value_ints").map(_.ints)
        .filter(_.nonEmpty).map(v => Tensor.ofLongs(Array(v.length), v.toArray)))
      .orElse(n.attrs.get("value_float").flatMap(_.f)
        .map(v => Tensor(Array(1), Array(v))))
      .getOrElse(sys.error("Constant node without a supported value attribute"))

  private def constantOfShape(n: Node, shape: Tensor): Tensor = {
    require(shape.isInt, "ConstantOfShape input must be int64")
    val dims = shape.longs.map(_.toInt)
    n.attrs.get("value").flatMap(_.t) match {
      case Some(v) if v.isInt => Tensor.ofLongs(dims, Array.fill(dims.product)(v.longs(0)))
      case Some(v) => Tensor(dims, Array.fill(dims.product)(v.data(0)))
      case None => Tensor(dims, new Array[Float](dims.product))
    }
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

/** The SENTENCE-TRANSFORMER recipe over a BERT-family ONNX export — the
  * reference's actual embedder shape (all-MiniLM-L6-v2,
  * /root/reference/src/embeddings.py:3): WordPiece-encode, feed the
  * `input_ids` / `attention_mask` / `token_type_ids` triple (whichever of
  * the three the graph declares), take `last_hidden_state` `[1, n, h]`,
  * MEAN-POOL over the token axis, L2-normalize. Model + vocab load once
  * per executor JVM through the [[BatchedModelEmbedder]] seam. */
object OnnxTransformerEmbedder {
  val EnvVar = "GRAFT_ONNX_ST_MODEL"

  def apply(modelPath: String, vocabPath: String, dim: Int,
            maxLen: Int = 256, batchSize: Int = 16): Embedder =
    new BatchedModelEmbedder[(Onnx.Graph, WordPiece)](
      name = s"onnx-st:$modelPath:$vocabPath",
      dim = dim,
      loadModel = () => (
        Onnx.parseModel(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(modelPath))),
        WordPiece.fromFile(vocabPath)),
      encodeBatch = (m, texts) => texts.map(t => encodeOne(m._1, m._2, t, dim, maxLen)),
      batchSize = batchSize)

  private[functions] def encodeOne(g: Onnx.Graph, wp: WordPiece, text: String,
                                   dim: Int, maxLen: Int): Array[Float] = {
    val ids = wp.encode(text, maxLen)
    val n = ids.length
    val inputs = g.inputNames.map {
      case name @ "input_ids" =>
        name -> Onnx.Tensor.ofLongs(Array(1, n), ids)
      case name @ "attention_mask" =>
        name -> Onnx.Tensor.ofLongs(Array(1, n), Array.fill(n)(1L))
      case name @ "token_type_ids" =>
        name -> Onnx.Tensor.ofLongs(Array(1, n), new Array[Long](n))
      case other => sys.error(s"transformer graph declares unexpected input '$other'")
    }.toMap
    val hidden = Onnx.run(g, inputs)
    val h = hidden.dims.last
    require(h == dim, s"artifact hidden size $h, embedder constructed with $dim")
    require(hidden.size == n * h,
      s"expected [1,$n,$h] hidden states, got ${hidden.dims.toSeq}")
    // mean pool over tokens (mask is all-ones for a single unpadded text)
    val acc = new Array[Double](h)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < h) { acc(j) += hidden.data(i * h + j); j += 1 }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < h) { acc(j) /= n; norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    Array.tabulate(h)(k => (acc(k) * inv).toFloat)
  }

  /** `GRAFT_ONNX_ST_MODEL` = `<model.onnx>:<vocab.txt>:<dim>` — parsed
    * from the RIGHT (dim, then vocab) so a model path containing ':'
    * (version-tagged directories) stays configurable. */
  def fromEnv(): Option[Embedder] = sys.env.get(EnvVar).map { v =>
    val di = v.lastIndexOf(':')
    require(di > 0, s"$EnvVar wants <model.onnx>:<vocab.txt>:<dim>")
    val vi = v.lastIndexOf(':', di - 1)
    require(vi > 0, s"$EnvVar wants <model.onnx>:<vocab.txt>:<dim>")
    apply(v.substring(0, vi), v.substring(vi + 1, di), v.substring(di + 1).toInt)
  }
}
