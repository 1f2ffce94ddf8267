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

  test("greedy encoder equals the sequential reference on trained tables (full vocab + fuzz)") {
    import graft.functions.{TextFunctions => TF}
    for (table <- Seq(Bpe.TrainedMerges, Bpe.TrainedMerges1k)) {
      val (a, b) = (table.map(_._1).toArray, table.map(_._2).toArray)
      // every word the fixture surface can produce...
      val vocab = spark.read.parquet(s"$sf001/documents.parquet").select(col("text"))
        .unionByName(spark.read.parquet(s"$sf001/customer.parquet")
          .select(col("c_name").as("text")))
        .select(explode(TF.tokens(col("text"))).as("w")).distinct()
        .collect().map(_.getString(0))
      // ...plus deterministic fuzz: unseen words, repeats, mixed alnum
      val rnd = new scala.util.Random(42)
      val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
      val fuzz = (0 until 500).map(_ =>
        (0 until (1 + rnd.nextInt(14))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      (vocab ++ fuzz :+ "" :+ "a").foreach { w =>
        assert(BpeOps.encodeWord(w, a, b).toSeq ==
          BpeOps.encodeWordSequential(w, a, b).toSeq,
          s"greedy/sequential divergence on '$w' (|merges|=${table.length})")
      }
    }
  }

  test("the frozen 1000-rule artifact equals a fresh training run; vocab stays discriminating") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text"))
      .unionByName(spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        .select(col("c_name").as("text")))
    val fresh = Bpe.train(corpus, "text", 1000)
    assert(fresh == Bpe.TrainedMerges1k,
      "the shipped 1000-rule artifact has drifted from its training recipe")
    // discriminating: customer-name words must encode to MULTIPLE tokens
    // (1 < n < len) for a healthy share — if everything collapsed to one
    // token, the oracle could not tell a broken encoder from a working one
    val (a, b) = (Bpe.TrainedMerges1k.map(_._1).toArray,
      Bpe.TrainedMerges1k.map(_._2).toArray)
    val names = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_name")).collect().map(_.getString(0))
    val counts = names.map { n =>
      val numTok = n.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).last
      BpeOps.encodeWord(numTok, a, b).length
    }
    assert(counts.count(c => c > 1) > names.length / 4,
      "vocab-scale table collapsed the whole name space — artifact not discriminating")
  }

  test("encode cost is flat in the merge-table size") {
    // the old per-rule-pass encoder was O(|merges| x len): 1000 rules cost
    // ~20x the 48-rule table. The greedy encoder touches the table only
    // through O(len) rank lookups; allow generous jitter but pin the shape.
    val words = {
      val rnd = new scala.util.Random(7)
      val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
      Array.fill(20000)((0 until (4 + rnd.nextInt(10)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    def time(table: Seq[(String, String)]): Long = {
      val (a, b) = (table.map(_._1).toArray, table.map(_._2).toArray)
      words.foreach(w => BpeOps.encodeWord(w, a, b)) // warm (JIT + rank cache)
      val t0 = System.nanoTime()
      var i = 0
      while (i < 3) { words.foreach(w => BpeOps.encodeWord(w, a, b)); i += 1 }
      System.nanoTime() - t0
    }
    val small = time(Bpe.TrainedMerges)
    val large = time(Bpe.TrainedMerges1k)
    assert(large < small * 5,
      f"encode under 1000 rules took ${large / 1e6}%.0f ms vs ${small / 1e6}%.0f ms " +
        "under 48 — cost is scaling with the merge table")
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
