package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Chroma client filter dialect → Catalyst [[Column]] predicates.
 *
 * The reference stack exposes metadata filters as JSON-ish dicts —
 * `collection.query(..., where={"source": {"$eq": "web"}})` and
 * `collection.get(where_document={"$contains": "model"})` — a surface the
 * 505-line demo attaches metadata for but never exercises
 * (/root/reference/src/cod.py:95 stores `{"source": ...}` per row;
 * chromadb's `where=` grammar is public client API). The engine's own
 * predicates are Catalyst [[Column]]s (graft.store.VectorStore.Collection
 * accepts them directly and they reach the parquet scan as pushed
 * filters); this translator makes the engine a DROP-IN target for client
 * code that already speaks the dict dialect.
 *
 * Supported `where=` grammar (chroma's operator set):
 *   {"field": value}                      — equality shorthand
 *   {"field": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": operand}}
 *   {"field": {"$in"|"$nin": [v, ...]}}
 *   {"$and"|"$or": [where, ...]}
 *   multiple keys in one object          — implicit $and
 * and for `where_document=`:
 *   {"$contains"|"$not_contains": "substr"}
 *   {"$regex"|"$not_regex": "pattern"}
 *   {"$and"|"$or": [whereDoc, ...]}
 *
 * Numeric operands compare numerically (the field side is cast to DOUBLE —
 * collection metadata is MAP<STRING,STRING>, so "12" < "9" lexically but
 * 12 > 9 under the dialect, matching chroma's typed-metadata semantics);
 * string and boolean operands compare as their own type. $in/$nin lists
 * must be HOMOGENEOUS (all numbers, all strings, or all booleans) — a
 * mixed list has no single coercion, and rejecting it keeps the two
 * backends (Catalyst predicate and compiled JVM closure — see
 * [[compileWhere]]) incapable of disagreeing.
 *
 * The JSON parser below is a zero-dependency recursive-descent reader
 * (the repo convention — functions.Onnx reads protobuf wire format the
 * same way), so the dialect works without any JSON library on the
 * classpath.
 */
object ChromaWhere {

  // ---------------------------------------------------------------- JSON
  sealed trait J
  final case class JStr(v: String) extends J
  final case class JInt(v: Long) extends J
  final case class JDbl(v: Double) extends J
  final case class JBool(v: Boolean) extends J
  case object JNull extends J
  final case class JArr(v: Vector[J]) extends J
  final case class JObj(v: Vector[(String, J)]) extends J

  /** Parse one JSON document (object/array/scalar); throws
    * IllegalArgumentException with position on malformed input. */
  def parseJson(s: String): J = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos} in where-filter JSON")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    private def peek: Char = {
      require(!eof, s"unexpected end of where-filter JSON at $pos")
      s.charAt(pos)
    }
    private def next(): Char = { val c = peek; pos += 1; c }
    private def expect(c: Char): Unit = {
      val g = next()
      require(g == c, s"expected '$c' at ${pos - 1}, got '$g'")
    }
    def skipWs(): Unit =
      while (!eof && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1

    def value(): J = {
      skipWs()
      peek match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c => throw new IllegalArgumentException(s"unexpected '$c' at $pos")
      }
    }

    private def lit(word: String): Unit = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length
    }

    private def obj(): J = {
      expect('{'); skipWs()
      val fields = Vector.newBuilder[(String, J)]
      if (peek == '}') { pos += 1; return JObj(Vector.empty) }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        fields += k -> value()
        skipWs()
        next() match {
          case ',' => ()
          case '}' => done = true
          case c => throw new IllegalArgumentException(s"expected ',' or '}' at ${pos - 1}, got '$c'")
        }
      }
      JObj(fields.result())
    }

    private def arr(): J = {
      expect('['); skipWs()
      val xs = Vector.newBuilder[J]
      if (peek == ']') { pos += 1; return JArr(Vector.empty) }
      var done = false
      while (!done) {
        xs += value()
        skipWs()
        next() match {
          case ',' => ()
          case ']' => done = true
          case c => throw new IllegalArgumentException(s"expected ',' or ']' at ${pos - 1}, got '$c'")
        }
      }
      JArr(xs.result())
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        next() match {
          case '"' => done = true
          case '\\' => next() match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              require(pos + 4 <= s.length, s"truncated \\u escape at $pos")
              sb += Integer.parseInt(s.substring(pos, pos + 4), 16).toChar
              pos += 4
            case c => throw new IllegalArgumentException(s"bad escape '\\$c' at ${pos - 1}")
          }
          case c => sb += c
        }
      }
      sb.toString
    }

    private def num(): J = {
      val start = pos
      if (peek == '-') pos += 1
      while (!eof && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      var isInt = true
      if (!eof && s.charAt(pos) == '.') {
        isInt = false; pos += 1
        while (!eof && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      }
      if (!eof && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        isInt = false; pos += 1
        if (!eof && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        while (!eof && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') pos += 1
      }
      val text = s.substring(start, pos)
      require(text.nonEmpty && text != "-", s"bad number at $start")
      if (isInt) JInt(java.lang.Long.parseLong(text)) else JDbl(java.lang.Double.parseDouble(text))
    }
  }

  // ----------------------------------------------------- where= dialect

  /** Translate a `where=` JSON filter; `resolve` maps a metadata key to
    * its Column (collections pass `element_at(col("meta"), k)`; plain
    * tables pass `col`). */
  def where(json: String, resolve: String => Column): Column =
    pred(parseJson(json), resolve)

  private def pred(j: J, resolve: String => Column): Column = j match {
    case JObj(fields) if fields.nonEmpty =>
      fields.map {
        case ("$and", JArr(xs)) if xs.nonEmpty => xs.map(pred(_, resolve)).reduce(_ && _)
        case ("$or", JArr(xs)) if xs.nonEmpty => xs.map(pred(_, resolve)).reduce(_ || _)
        case (op, _) if op.startsWith("$") =>
          throw new IllegalArgumentException(s"unknown/malformed logical operator '$op'")
        case (k, JObj(ops)) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
          ops.map { case (op, operand) => opPred(resolve(k), op, operand) }.reduce(_ && _)
        case (k, v: JObj) =>
          throw new IllegalArgumentException(s"nested object for field '$k' is not an operator form: $v")
        case (k, v) => opPred(resolve(k), "$eq", v)
      }.reduce(_ && _)
    case other =>
      throw new IllegalArgumentException(s"where-filter must be a non-empty object, got $other")
  }

  /** Field vs operand with chroma's typed comparison: numeric operand →
    * numeric field compare (cast to DOUBLE), string → string, bool → bool. */
  private def opPred(field: Column, op: String, operand: J): Column = {
    def scalar(v: J): (Column, Column) = v match {
      case JInt(n) => (field.try_cast("double"), lit(n.toDouble))
      case JDbl(n) => (field.try_cast("double"), lit(n))
      case JStr(x) => (field, lit(x))
      case JBool(b) => (field.try_cast("boolean"), lit(b))
      case other => throw new IllegalArgumentException(s"bad operand for $op: $other")
    }
    op match {
      case "$eq" => val (f, v) = scalar(operand); f === v
      case "$ne" => val (f, v) = scalar(operand); f =!= v
      case "$gt" => val (f, v) = scalar(operand); f > v
      case "$gte" => val (f, v) = scalar(operand); f >= v
      case "$lt" => val (f, v) = scalar(operand); f < v
      case "$lte" => val (f, v) = scalar(operand); f <= v
      case "$in" | "$nin" =>
        val (f, vals) = inOperands(field, op, operand)
        if (op == "$in") f.isin(vals: _*) else !f.isin(vals: _*)
      case other => throw new IllegalArgumentException(s"unknown where operator '$other'")
    }
  }

  /** $in/$nin operand classification, shared by both backends: the list
    * must be HOMOGENEOUS (all numeric, all string, or all boolean) so the
    * Catalyst and hot-tier evaluations can never disagree on coercion. */
  private def inKind(op: String, operand: J): (Char, Vector[J]) = {
    val xs = operand match {
      case JArr(v) if v.nonEmpty => v
      case other => throw new IllegalArgumentException(s"$op needs a non-empty array, got $other")
    }
    val kind =
      if (xs.forall { case JInt(_) | JDbl(_) => true; case _ => false }) 'n'
      else if (xs.forall { case JStr(_) => true; case _ => false }) 's'
      else if (xs.forall { case JBool(_) => true; case _ => false }) 'b'
      else throw new IllegalArgumentException(
        s"$op needs a homogeneous array (all numbers, all strings, or all booleans), got $xs")
    (kind, xs)
  }

  private def inOperands(field: Column, op: String, operand: J): (Column, Seq[Any]) =
    inKind(op, operand) match {
      case ('n', xs) => (field.try_cast("double"),
        xs.map { case JInt(n) => n.toDouble; case JDbl(n) => n; case _ => 0.0 })
      case ('b', xs) => (field.try_cast("boolean"),
        xs.map { case JBool(b) => b; case _ => false })
      case (_, xs) => (field, xs.map { case JStr(x) => x; case _ => "" })
    }

  // -------------------------------------------- where_document= dialect

  /** Translate a `where_document=` JSON filter over the given text column. */
  def whereDocument(json: String, doc: Column): Column =
    docPred(parseJson(json), doc)

  // ------------------------------- hot-tier compiled evaluators
  // The SAME dialect compiled to plain JVM closures — what the in-memory
  // serving tier (GraphIndex/IvfIndex hot state) evaluates per candidate
  // with zero Spark jobs. This is the payoff of a DECLARATIVE filter
  // grammar: an opaque Catalyst Column cannot be introspected, but the
  // dict form compiles to BOTH backends. Catalyst-cast parity is pinned
  // by ChromaWhereSpec: a missing key or failed cast behaves like SQL
  // NULL — the row never matches, under ANY operator including $ne/$nin.

  /** Compile a `where=` filter to a metadata-map evaluator. All constant
    * work — operand parsing, set materialization, closure wiring —
    * happens HERE, once; the returned closure does only map lookups and
    * comparisons, which is what a sub-millisecond hot probe can afford. */
  def compileWhere(json: String): Map[String, String] => Boolean = {
    val j = parseJson(json)
    pred(j, col) // validate operators eagerly with the Column translator
    compilePred(j)
  }

  /** Compile a `where_document=` filter to a document-text evaluator
    * (null document == SQL NULL: never matches). Regex patterns compile
    * ONCE here, not per candidate row. */
  def compileWhereDocument(json: String): String => Boolean = {
    val j = parseJson(json)
    docPred(j, col("doc")) // eager operator validation
    compileDocPred(j)
  }

  /** Spark's StringType→DoubleType cast semantics: trim, the special
    * floating-point literals Cast accepts case-insensitively
    * (inf/infinity/nan with optional sign —
    * Cast.processFloatingPointSpecialLiterals), then Java parse; null on
    * failure. */
  private def toDoubleOpt(s: String): Option[Double] = {
    val t = s.trim
    if (t.isEmpty) return None
    t.toLowerCase match {
      case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
      case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
      case "nan" => Some(Double.NaN)
      case _ =>
        try Some(java.lang.Double.parseDouble(t))
        catch { case _: NumberFormatException => None }
    }
  }

  /** Spark's StringType→BooleanType cast token set. */
  private def toBoolOpt(s: String): Option[Boolean] = s.trim.toLowerCase match {
    case "t" | "true" | "y" | "yes" | "1" => Some(true)
    case "f" | "false" | "n" | "no" | "0" => Some(false)
    case _ => None
  }

  private def compilePred(j: J): Map[String, String] => Boolean = j match {
    case JObj(fields) if fields.nonEmpty =>
      val parts: Vector[Map[String, String] => Boolean] = fields.map {
        case ("$and", JArr(xs)) if xs.nonEmpty =>
          val cs = xs.map(compilePred)
          (m: Map[String, String]) => cs.forall(_(m))
        case ("$or", JArr(xs)) if xs.nonEmpty =>
          val cs = xs.map(compilePred)
          (m: Map[String, String]) => cs.exists(_(m))
        case (k, JObj(ops)) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
          val cs = ops.map { case (op, operand) => compileOp(op, operand) }
          (m: Map[String, String]) => { val f = m.get(k); cs.forall(_(f)) }
        case (k, v) =>
          val c = compileOp("$eq", v)
          (m: Map[String, String]) => c(m.get(k))
      }
      m => parts.forall(_(m))
    case other =>
      throw new IllegalArgumentException(s"where-filter must be a non-empty object, got $other")
  }

  /** Spark's `nanSafeCompareDoubles`: -0.0 == 0.0, NaN == NaN, NaN
    * greater than everything else. */
  private def sparkCmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else if (java.lang.Double.isNaN(x) && java.lang.Double.isNaN(y)) 0
    else if (java.lang.Double.isNaN(x)) 1 else -1

  /** Spark's StringType ordering: UNSIGNED BYTE-wise over UTF-8
    * (UTF8String.binaryCompare) — Java String.compareTo diverges on
    * supplementary characters (UTF-16 code-unit order), so it cannot be
    * used here without breaking hot-vs-Spark answer parity. */
  private def strCmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def compileOp(op: String, operand: J): Option[String] => Boolean = {
    def cmp(f: Int => Boolean): Option[String] => Boolean = operand match {
      case JInt(n) =>
        val y = n.toDouble
        field => field.flatMap(toDoubleOpt).exists(v => f(sparkCmp(v, y)))
      case JDbl(y) =>
        field => field.flatMap(toDoubleOpt).exists(v => f(sparkCmp(v, y)))
      case JStr(x) =>
        field => field.exists(v => f(strCmp(v, x)))
      case JBool(b) =>
        field => field.flatMap(toBoolOpt).exists(v => f(v.compareTo(b)))
      case other => throw new IllegalArgumentException(s"bad operand for $op: $other")
    }
    op match {
      case "$eq" => cmp(_ == 0)
      case "$ne" => cmp(_ != 0)
      case "$gt" => cmp(_ > 0)
      case "$gte" => cmp(_ >= 0)
      case "$lt" => cmp(_ < 0)
      case "$lte" => cmp(_ <= 0)
      case "$in" | "$nin" =>
        // SQL NULL discipline either way: a missing/uncastable field
        // matches NEITHER $in NOR $nin (NOT(null IN ...) is null).
        // Numeric membership goes through sparkCmp, not Set[Double] —
        // doubleToLongBits hashing would split -0.0 from 0.0, which
        // Spark's In (nan-safe equality) does not.
        inKind(op, operand) match {
          case ('n', xs) =>
            val vals = xs.map { case JInt(n) => n.toDouble; case JDbl(n) => n; case _ => 0.0 }.toArray
            val neg = op == "$nin"
            field => field.flatMap(toDoubleOpt)
              .exists(v => vals.exists(sparkCmp(v, _) == 0) != neg)
          case ('b', xs) =>
            val set = xs.map { case JBool(b) => b; case _ => false }.toSet
            val neg = op == "$nin"
            field => field.flatMap(toBoolOpt).exists(set.contains(_) != neg)
          case (_, xs) =>
            val set = xs.map { case JStr(x) => x; case _ => "" }.toSet
            val neg = op == "$nin"
            field => field.exists(set.contains(_) != neg)
        }
      case other => throw new IllegalArgumentException(s"unknown where operator '$other'")
    }
  }

  private def compileDocPred(j: J): String => Boolean = j match {
    case JObj(Vector((op, operand))) => (op, operand) match {
      case ("$and", JArr(xs)) if xs.nonEmpty =>
        val cs = xs.map(compileDocPred)
        d => cs.forall(_(d))
      case ("$or", JArr(xs)) if xs.nonEmpty =>
        val cs = xs.map(compileDocPred)
        d => cs.exists(_(d))
      case ("$contains", JStr(s0)) => d => d != null && d.contains(s0)
      case ("$not_contains", JStr(s0)) => d => d != null && !d.contains(s0)
      case ("$regex", JStr(r)) =>
        val p = java.util.regex.Pattern.compile(r)
        d => d != null && p.matcher(d).find()
      case ("$not_regex", JStr(r)) =>
        val p = java.util.regex.Pattern.compile(r)
        d => d != null && !p.matcher(d).find()
      case _ => throw new IllegalArgumentException(s"unknown where_document operator '$op'")
    }
    case other =>
      throw new IllegalArgumentException(s"where_document filter must be a single-operator object, got $other")
  }

  private def docPred(j: J, doc: Column): Column = j match {
    case JObj(Vector((op, operand))) => (op, operand) match {
      case ("$and", JArr(xs)) if xs.nonEmpty => xs.map(docPred(_, doc)).reduce(_ && _)
      case ("$or", JArr(xs)) if xs.nonEmpty => xs.map(docPred(_, doc)).reduce(_ || _)
      case ("$contains", JStr(s0)) => doc.contains(s0)
      case ("$not_contains", JStr(s0)) => !doc.contains(s0)
      case ("$regex", JStr(r)) => doc.rlike(r)
      case ("$not_regex", JStr(r)) => !doc.rlike(r)
      case _ => throw new IllegalArgumentException(s"unknown where_document operator '$op'")
    }
    case other =>
      throw new IllegalArgumentException(s"where_document filter must be a single-operator object, got $other")
  }
}
