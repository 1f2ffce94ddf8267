package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkTest {

  private lazy val toks = spark.read.parquet(s"$sf001/documents.parquet")
    .select(explode(TF.tokens(col("text"))).as("tok"))

  test("CMS-pruned heavy hitters equal the plain groupBy + HAVING exactly") {
    val t = 800L
    val got = HeavyHitters.exactHeavyHitters(toks, "tok", t)
      .orderBy("tok").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= t)
      .orderBy("tok").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "threshold chosen so some hitters exist")
  }

  test("LONG keys: CMS probe dispatches on type and still equals the plain query") {
    // the r1 String-typed UDF probe would estimate ~0 for every long key and
    // prune ALL rows — this asserts the typed dispatch keeps exactness
    val nums = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("k"))
    val t = 30L
    val got = HeavyHitters.exactHeavyHitters(nums, "k", t)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = nums.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") >= t)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "threshold chosen so some hitters exist")
  }

  test("unsupported key types are rejected; probe stays inside codegen (no UDF)") {
    import spark.implicits._
    val doubles = Seq(1.0, 2.0).toDF("k")
    assertThrows[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(doubles, "k", 1L).collect()
    }
    val plan = HeavyHitters.exactHeavyHitters(toks, "tok", 800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"sketch probe must not be a UDF barrier:\n$plan")
  }

  test("the sketch pre-filter prunes sub-threshold rows before the shuffle") {
    val t = 800L
    val cms = toks.stat.countMinSketch("tok", 0.001, 0.99, 42)
    val cmsB = spark.sparkContext.broadcast(cms)
    val heavy = udf((k: String) => k != null && cmsB.value.estimateCount(k) >= t)
    val total = toks.count()
    val kept = toks.filter(heavy(col("tok"))).count()
    info(s"token stream: $total rows, past CMS: $kept")
    assert(kept < total, "pruning must drop something on this distribution")
    // no false negatives: every truly-heavy token's rows all survive
    val trueHeavy = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= t).agg(sum("n")).head().getLong(0)
    assert(kept >= trueHeavy)
  }
}
