package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def pairDf(a: Array[Float], b: Array[Float]) =
    Seq((a, b)).toDF("a", "b")

  private def eval(c: org.apache.spark.sql.Column, a: Array[Float], b: Array[Float]): Double =
    pairDf(a, b).select(c.as("r")).head().getDouble(0)

  test("cosine: hand-computed values") {
    val got = eval(VF.cosine(col("a"), col("b")),
      Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    assert(got === 0.0)
    val same = eval(VF.cosine(col("a"), col("b")),
      Array(1f, 2f, 3f), Array(1f, 2f, 3f))
    assert(math.abs(same - 1.0) < 1e-12)
    val opp = eval(VF.cosine(col("a"), col("b")),
      Array(1f, 2f), Array(-1f, -2f))
    assert(math.abs(opp + 1.0) < 1e-12)
  }

  test("cosine: zero-norm guard returns -1.0 (reference src/app.py:57-58)") {
    assert(eval(VF.cosine(col("a"), col("b")), Array(0f, 0f), Array(1f, 2f)) === -1.0)
    assert(eval(VF.cosine(col("a"), col("b")), Array(1f, 2f), Array(0f, 0f)) === -1.0)
    assert(eval(VF.cosine(col("a"), col("b")), Array(0f, 0f), Array(0f, 0f)) === -1.0)
  }

  test("l2_sq and dot: hand-computed values") {
    assert(eval(VF.l2Sq(col("a"), col("b")), Array(1f, 2f, 3f), Array(4f, 6f, 8f)) === 50.0)
    assert(eval(VF.dot(col("a"), col("b")), Array(1f, 2f, 3f), Array(4f, 5f, 6f)) === 32.0)
  }

  test("norm: hand-computed value") {
    val got = Seq(Tuple1(Array(3f, 4f))).toDF("a")
      .select(VF.norm(col("a")).as("r")).head().getDouble(0)
    assert(got === 5.0)
  }

  test("codegen kernels are bitwise-identical to HOF reference on real data") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    val q = e.orderBy("vec_id").limit(1).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q)).select(
      VF.cosine(col("embedding"), col("qe")).as("c_native"),
      VF.cosineHof(col("embedding"), col("qe")).as("c_hof"),
      VF.l2Sq(col("embedding"), col("qe")).as("l_native"),
      VF.l2SqHof(col("embedding"), col("qe")).as("l_hof"),
      VF.dot(col("embedding"), col("qe")).as("d_native"),
      VF.dotHof(col("embedding"), col("qe")).as("d_hof"))
    val bad = both.filter(
      col("c_native") =!= col("c_hof") ||
      col("l_native") =!= col("l_hof") ||
      col("d_native") =!= col("d_hof")).count()
    assert(bad === 0, "codegen and HOF kernels diverged")
  }

  test("cosine range and l2 non-negativity on real data (property)") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.orderBy("vec_id").limit(1).select(col("embedding").as("qe"))
    val stats = e.crossJoin(broadcast(q)).select(
      VF.cosine(col("embedding"), col("qe")).as("c"),
      VF.l2Sq(col("embedding"), col("qe")).as("l"))
      .agg(min("c"), max("c"), min("l")).head()
    assert(stats.getDouble(0) >= -1.0 - 1e-9)
    assert(stats.getDouble(1) <= 1.0 + 1e-9)
    assert(stats.getDouble(2) >= 0.0)
  }

  test("l2_normalize produces unit vectors; zero vector unchanged") {
    val df = Seq(
      Tuple1(Array(3f, 4f, 0f)),
      Tuple1(Array(0f, 0f, 0f))).toDF("a")
    val norms = df.select(VF.norm(VF.l2Normalize(col("a"))).as("n"))
      .collect().map(_.getDouble(0))
    assert(math.abs(norms(0) - 1.0) < 1e-6)
    assert(norms(1) === 0.0)
  }

  test("SQL registration works") {
    VF.registerAll(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("dimension mismatch fails fast") {
    intercept[Exception] {
      eval(VF.cosine(col("a"), col("b")), Array(1f, 2f), Array(1f, 2f, 3f))
    }
  }

  test("nearest_centroid matches struct-min composition; ties to lowest id") {
    val cents: Array[(Long, Array[Float])] = Array(
      (0L, Array(0f, 0f)), (1L, Array(10f, 0f)), (2L, Array(0f, 10f)),
      (3L, Array(0f, 0f))) // duplicate of centroid 0 -> tie
    val df = Seq(
      Tuple1(Array(1f, 1f)),     // nearest 0 (tie with 3 -> 0 wins)
      Tuple1(Array(9f, 1f)),     // nearest 1
      Tuple1(Array(1f, 9f)),     // nearest 2
      Tuple1(Array(6f, 6f))      // equidistant 1 and 2 (52 each) -> 1 wins
    ).toDF("a")
    val fused = df.select(VF.nearestCentroid(col("a"), cents).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val structs = cents.toSeq.map { case (cid, c) =>
      struct(VF.l2Sq(col("a"), typedlit(c)).as("d"), lit(cid).as("cid"))
    }
    val ref = df.select(array_min(array(structs: _*)).getField("cid").as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(fused == ref)
    assert(fused == Seq(0L, 1L, 2L, 1L))
    // interpreted path agrees with codegen
    val lit6 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(6f, 6f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val interp = graft.functions.NearestCentroid(lit6, cents.map(_._1), cents.map(_._2))
    assert(interp.eval(null) == 1L)
  }
}
