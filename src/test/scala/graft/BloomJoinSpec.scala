package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite with SparkTest {

  private lazy val fact = spark.read.parquet(s"$sf001/lineitem.parquet")
  private lazy val dim = spark.read.parquet(s"$sf001/part.parquet")
    .filter(col("p_size") >= 48)

  test("bloom-pruned join result equals the plain join exactly") {
    val pruned = BloomJoin.prunedJoin(fact, dim, "l_partkey", "p_partkey", 20000)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("STRING keys: bloom probe dispatches on type; result equals the plain join") {
    // the r1 mightContainLong probe would cast string keys to null and drop
    // every matching fact row — typed dispatch must keep the row-for-row
    // equality contract for string joins too
    val factS = fact.withColumn("lk", concat(lit("p"), col("l_partkey").cast("string")))
    val dimS = dim.withColumn("dk", concat(lit("p"), col("p_partkey").cast("string")))
    val pruned = BloomJoin.prunedJoin(factS, dimS, "lk", "dk", 20000)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val plain = factS.join(dimS, col("lk") === col("dk"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("mixed string/long key types are rejected up front") {
    val dimS = dim.withColumn("dk", col("p_partkey").cast("string"))
    assertThrows[IllegalArgumentException] {
      BloomJoin.prunedJoin(fact, dimS, "l_partkey", "dk", 20000)
    }
  }

  test("the pre-filter prunes non-matching fact rows before the join") {
    val bf = dim.stat.bloomFilter("p_partkey", 20000, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    val total = fact.count()
    val kept = fact.filter(mightContain(col("l_partkey"))).count()
    val trueMatch = fact.join(dim.select("p_partkey"),
      col("l_partkey") === col("p_partkey"), "left_semi").count()
    info(s"fact rows: $total, past bloom: $kept, true matches: $trueMatch")
    // no false negatives ...
    assert(kept >= trueMatch)
    // ... and the filter actually prunes (dim keeps ~6% of parts at fpp 1%,
    // so well under half the fact rows may survive)
    assert(kept < total / 2, s"bloom pruned nothing: $kept of $total")
  }
}
