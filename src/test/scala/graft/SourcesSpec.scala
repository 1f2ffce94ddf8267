package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Source-format parity (SURVEY §2.1 S1/S3) + skew-join + SQL extensions. */
class SourcesSpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    graft.store.Scratch.dir("graft_src")

  test("S1: text-file corpus scan, one doc per line, trimmed (main.py:6-9)") {
    val dir = tmp()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").limit(50).collect().map(_.getString(0))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/corpus.txt"),
      texts.map("  " + _ + " ").mkString("\n").getBytes("UTF-8"))
    val corpus = spark.read.text(s"$dir/corpus.txt")
      .select(trim(col("value")).as("doc"))
    assert(corpus.count() == 50)
    assert(corpus.filter(col("doc").startsWith(" ")).count() == 0)
    assert(corpus.collect().map(_.getString(0)).toSeq == texts.toSeq)
  }

  test("S3/F12: JSON embedding file load with schema validation (app.py:204-209)") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/emb.json"),
      "[0.5, 0.25, -1.0]".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.json"),
      "{\"not\": \"a list\"}".getBytes("UTF-8"))
    def load(path: String) = spark.read.text(path)
      .select(from_json(col("value"), ArrayType(FloatType)).as("emb"))
    val good = load(s"$dir/emb.json").head()
    assert(good.getSeq[Float](0) == Seq(0.5f, 0.25f, -1.0f))
    // schema mismatch -> null -> caller fails fast (the reference exits)
    assert(load(s"$dir/bad.json").head().isNullAt(0))
  }

  test("salted skew join equals the plain join") {
    import spark.implicits._
    // skewed: 90% of probe rows share key 1
    val probe = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "v")
    val build = (1L to 9L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(probe, build, "k", salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("GraftExtensions: SQL functions available without registerAll") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
        "poly_hash('abc') AS h").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 304891L)
  }
}
