package graft

import graft.functions.ChromaWhere
import graft.functions.ChromaWhere._
import graft.functions.{TextFunctions => TF}
import graft.store.VectorStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The chroma dict filter dialect: JSON parsing, operator translation, and
  * the Collection getJson/queryJson/deleteJson client surface. */
class ChromaWhereSpec extends AnyFunSuite with SparkTest {

  test("JSON parser: nesting, escapes, number forms, trailing junk") {
    assert(parseJson("""{"a": 1}""") == JObj(Vector("a" -> JInt(1))))
    assert(parseJson("""{"a": [1, -2.5, "x", true, null]}""") ==
      JObj(Vector("a" -> JArr(Vector(JInt(1), JDbl(-2.5), JStr("x"), JBool(true), JNull)))))
    assert(parseJson("""{"k": "q\"\\\nA"}""") == JObj(Vector("k" -> JStr("q\"\\\nA"))))
    assert(parseJson("""{"e": 1e3}""") == JObj(Vector("e" -> JDbl(1000.0))))
    assert(parseJson("""{ "s" : { } , "t" : [ ] }""") ==
      JObj(Vector("s" -> JObj(Vector.empty), "t" -> JArr(Vector.empty))))
    intercept[IllegalArgumentException](parseJson("""{"a": 1} extra"""))
    intercept[IllegalArgumentException](parseJson("""{"a": }"""))
    intercept[IllegalArgumentException](parseJson("""{'a': 1}"""))
  }

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  /** Oracle on the same frame with native Column predicates. */
  private def ids(p: org.apache.spark.sql.Column): Seq[Long] =
    docs.filter(p).select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq

  private def dialectIds(whereJson: String): Seq[Long] =
    docs.filter(ChromaWhere.where(whereJson, col))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq

  test("where dialect matches native Column predicates operator by operator") {
    assert(dialectIds("""{"lang": "en"}""") == ids(col("lang") === "en"))
    assert(dialectIds("""{"lang": {"$ne": "en"}}""") == ids(col("lang") =!= "en"))
    assert(dialectIds("""{"n_chars": {"$gt": 300}}""") == ids(col("n_chars") > 300))
    assert(dialectIds("""{"n_chars": {"$gte": 300, "$lt": 400}}""") ==
      ids(col("n_chars") >= 300 && col("n_chars") < 400))
    assert(dialectIds("""{"lang": {"$in": ["en", "zh"]}}""") ==
      ids(col("lang").isin("en", "zh")))
    assert(dialectIds("""{"lang": {"$nin": ["en", "zh"]}}""") ==
      ids(!col("lang").isin("en", "zh")))
    // multiple keys in one object = implicit $and
    assert(dialectIds("""{"lang": "en", "source": "src3"}""") ==
      ids(col("lang") === "en" && col("source") === "src3"))
    assert(dialectIds("""{"$or": [{"lang": "zh"}, {"n_chars": {"$lte": 60}}]}""") ==
      ids(col("lang") === "zh" || col("n_chars") <= 60))
    assert(dialectIds(
      """{"$and": [{"lang": {"$in": ["en","de"]}}, {"$or": [{"source": "src1"}, {"n_chars": {"$lt": 100}}]}]}""") ==
      ids(col("lang").isin("en", "de") && (col("source") === "src1" || col("n_chars") < 100)))
  }

  test("where_document dialect: contains / not_contains / regex / logic") {
    def dIds(json: String): Seq[Long] =
      docs.filter(ChromaWhere.whereDocument(json, col("text")))
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(dIds("""{"$contains": "data"}""") == ids(col("text").contains("data")))
    assert(dIds("""{"$not_contains": "data"}""") == ids(!col("text").contains("data")))
    assert(dIds("""{"$regex": "dat[a-z]+"}""") == ids(col("text").rlike("dat[a-z]+")))
    assert(dIds("""{"$and": [{"$contains": "data"}, {"$not_contains": "stream"}]}""") ==
      ids(col("text").contains("data") && !col("text").contains("stream")))
    assert(dIds("""{"$or": [{"$contains": "data"}, {"$contains": "stream"}]}""") ==
      ids(col("text").contains("data") || col("text").contains("stream")))
  }

  test("numeric operands compare numerically against string-typed metadata") {
    import spark.implicits._
    val df = Seq(("a", "12"), ("b", "9"), ("c", "100")).toDF("id", "v")
    // lexically "12" < "9"; the dialect must compare as numbers
    val got = df.filter(ChromaWhere.where("""{"v": {"$gt": 10}}""", col))
      .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "c"))
    val inGot = df.filter(ChromaWhere.where("""{"v": {"$in": [9, 100]}}""", col))
      .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
    assert(inGot == Seq("b", "c"))
  }

  test("compiled JVM evaluators match Catalyst semantics (casts, NULLs, NaN, -0.0)") {
    import spark.implicits._
    val metas: Seq[Map[String, String]] = Seq(
      Map("a" -> "5", "b" -> "x"),
      Map("a" -> "12.5"),
      Map("a" -> "not a number", "b" -> "y"),
      Map("a" -> "", "b" -> ""),
      Map("a" -> " 7 ", "b" -> "X"),
      Map("b" -> "x"), // a missing
      Map.empty[String, String],
      Map("a" -> "NaN"),
      Map("a" -> "-0.0"),
      Map("a" -> "1e2", "b" -> "yes"),
      Map("f" -> "true"), Map("f" -> "YES"), Map("f" -> "0"), Map("f" -> "maybe"),
      Map("a" -> "inf"), Map("a" -> "-Infinity"),
      // supplementary-plane char: UTF-8 binary order (Spark) disagrees
      // with Java String.compareTo (UTF-16 code units) here
      Map("b" -> "😀"))
    val df = metas.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("rid", "meta")
    val filters = Seq(
      """{"a": {"$gt": 4}}""",
      """{"a": {"$gte": 0}}""",
      """{"a": {"$eq": 100}}""",
      """{"a": {"$ne": 5}}""",
      """{"a": {"$lte": 12.5}}""",
      """{"a": "5"}""",
      """{"b": {"$in": ["x", "z"]}}""",
      """{"b": {"$nin": ["x", "z"]}}""",
      """{"a": {"$in": [5, 100]}}""",
      """{"a": {"$nin": [5]}}""",
      """{"f": true}""",
      """{"f": {"$ne": false}}""",
      """{"$or": [{"a": {"$lt": 6}}, {"b": "y"}]}""",
      """{"$and": [{"a": {"$gte": 5}}, {"a": {"$lte": 100}}]}""",
      """{"b": {"$gt": "w"}}""",
      """{"a": {"$gt": 1000}}""",
      """{"a": {"$lt": -1000}}""",
      """{"a": {"$in": [0]}}""",
      """{"f": {"$in": [true]}}""",
      """{"f": {"$nin": [false]}}""",
      """{"b": {"$gt": "�"}}""")
    for (f <- filters) {
      val viaColumn = df.filter(ChromaWhere.where(f, k => element_at(col("meta"), lit(k))))
        .select("rid").collect().map(_.getLong(0)).toSet
      val ev = ChromaWhere.compileWhere(f)
      val viaClosure = metas.zipWithIndex.collect { case (m, i) if ev(m) => i.toLong }.toSet
      assert(viaColumn == viaClosure, s"filter $f: Catalyst=$viaColumn compiled=$viaClosure")
    }
    val docsSeq = Seq("alpha data beta", "no match here", null, "DATA upper", "doc 42")
    val ddf = docsSeq.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("rid", "doc")
    val dFilters = Seq(
      """{"$contains": "data"}""",
      """{"$not_contains": "data"}""",
      """{"$regex": "d[ao]ta"}""",
      """{"$not_regex": "^no"}""",
      """{"$and": [{"$contains": "a"}, {"$or": [{"$contains": "42"}, {"$contains": "beta"}]}]}""")
    for (f <- dFilters) {
      val viaColumn = ddf.filter(ChromaWhere.whereDocument(f, col("doc")))
        .select("rid").collect().map(_.getLong(0)).toSet
      val ev = ChromaWhere.compileWhereDocument(f)
      val viaClosure = docsSeq.zipWithIndex.collect { case (d, i) if ev(d) => i.toLong }.toSet
      assert(viaColumn == viaClosure, s"doc filter $f: Catalyst=$viaColumn compiled=$viaClosure")
    }
  }

  test("malformed filters refuse loudly") {
    intercept[IllegalArgumentException](ChromaWhere.where("""{}""", col))
    intercept[IllegalArgumentException](ChromaWhere.where("""{"a": {"$bogus": 1}}""", col))
    intercept[IllegalArgumentException](ChromaWhere.where("""{"$and": []}""", col))
    intercept[IllegalArgumentException](ChromaWhere.where("""{"a": {"$in": []}}""", col))
    intercept[IllegalArgumentException](ChromaWhere.where("""[1, 2]""", col))
    intercept[IllegalArgumentException](ChromaWhere.whereDocument("""{"$contains": 3}""", col("x")))
    intercept[IllegalArgumentException](
      ChromaWhere.whereDocument("""{"$contains": "a", "$regex": "b"}""", col("x")))
  }

  test("Collection getJson/queryJson/deleteJson: the chroma client surface end to end") {
    val base = graft.store.Scratch.dir("graft_chroma_where")
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("cw")
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("doc"),
        map(lit("lang"), col("lang"), lit("n_chars"), col("n_chars").cast("string")).as("meta"),
        TF.hashEmbed(TF.tokens(col("text")), 64).as("emb"))
    c.add(rows)

    // getJson == get with the equivalent Column predicates
    val viaJson = c.getJson(
      whereJson = """{"$and": [{"lang": {"$in": ["en","de"]}}, {"n_chars": {"$gte": 250}}]}""",
      whereDocumentJson = """{"$contains": "data"}""")
      .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
    val viaCol = c.get(
      where = Some(element_at(col("meta"), lit("lang")).isin("en", "de") &&
        element_at(col("meta"), lit("n_chars")).cast("double") >= 250.0),
      whereDocument = Some(col("doc").contains("data")))
      .select("id").orderBy("id").collect().map(_.getString(0)).toSeq
    assert(viaJson == viaCol && viaJson.nonEmpty)

    // queryJson == query with the same translated predicate
    val qe = rows.filter(col("id") === "0").select("emb").head().getSeq[Float](0).toArray
    val qJson = c.queryJson(qe, k = 5, metric = "cosine",
      whereJson = """{"lang": "en"}""").select("id").collect().map(_.getString(0)).toSeq
    val qCol = c.query(qe, k = 5, metric = "cosine",
      where = Some(element_at(col("meta"), lit("lang")) === "en"))
      .select("id").collect().map(_.getString(0)).toSeq
    assert(qJson == qCol && qJson.size == 5)

    // deleteJson drops exactly the dialect matches
    val nBefore = c.count()
    val nZh = c.getJson(whereJson = """{"lang": "zh"}""").count()
    assert(nZh > 0)
    c.deleteJson(whereJson = """{"lang": "zh"}""")
    assert(c.count() == nBefore - nZh)
    assert(c.getJson(whereJson = """{"lang": "zh"}""").count() == 0)
    intercept[IllegalArgumentException](c.deleteJson())
  }
}
