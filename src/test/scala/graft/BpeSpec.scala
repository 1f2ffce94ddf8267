package graft

import graft.functions.{Bpe, BpeOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("train learns the hand-computed merges on the classic fixture") {
    // low x3, lower x2, newest x1:
    //  round 1: (l,o) and (o,w) tie at 5 -> lexicographically smallest (l,o)
    //  round 2: (lo,w) at 5
    //  round 3: (low,e) and (e,r) tie at 2 -> (e,r)
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 3)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
  }

  test("train is deterministic under repartitioning") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.train(base.repartition(7), "text", 12)
    val b = Bpe.train(base.repartition(2).sortWithinPartitions(desc("doc_id")), "text", 12)
    assert(a == b, "the learned table must not depend on partitioning")
  }

  test("the frozen TrainedMerges equal a fresh sf0.01 training run") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fresh = Bpe.train(docs, "text", Bpe.TrainedMerges.length)
    assert(fresh == Bpe.TrainedMerges,
      "the shipped model artifact has drifted from its training recipe")
  }

  test("encode applies merges with replace() semantics (left-to-right, non-overlapping)") {
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    def enc(w: String) =
      BpeOps.encodeWord(w, m.map(_._1).toArray, m.map(_._2).toArray).toSeq
    assert(enc("lowest") == Seq("low", "e", "s", "t"))
    assert(enc("lower") == Seq("low", "er"))
    // [a,a,a] under (a,a): merge consumes both symbols, scan resumes after
    val aa = Seq(("a", "a"))
    assert(BpeOps.encodeWord("aaa", aa.map(_._1).toArray, aa.map(_._2).toArray).toSeq
      == Seq("aa", "a"))
    // empty word
    assert(enc("") == Seq.empty)
  }

  test("codegen column kernel equals the driver kernel; n_bpe bounds hold") {
    import graft.functions.{TextFunctions => TF}
    val out = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_words"),
        Bpe.countTokens(col("toks"), Bpe.TrainedMerges).as("n_bpe"),
        col("toks"))
      .collect()
    out.foreach { r =>
      val words = r.getSeq[String](3)
      val expect = words.map(w => BpeOps.encodeWord(w,
        Bpe.TrainedMerges.map(_._1).toArray, Bpe.TrainedMerges.map(_._2).toArray).length.toLong).sum
      assert(r.getAs[Long]("n_bpe") == expect, s"doc ${r.getLong(0)} kernel mismatch")
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_words"),
        "subword count can never undercut the word count")
    }
  }
}
