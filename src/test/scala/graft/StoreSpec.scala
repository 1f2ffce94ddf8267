package graft

import graft.functions.{TextFunctions => TF}
import graft.store.{EncryptedStore, VectorStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StoreSpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    graft.store.Scratch.dir("graft_test_store")

  private def docRows = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id").cast("string").as("id"), col("text").as("doc"),
      map(lit("lang"), col("lang")).as("meta"), TF.tokens(col("text")).as("toks"))
    .select(col("id"), col("doc"), col("meta"), TF.hashEmbed(col("toks"), 64).as("emb"))

  test("createOrGet is idempotent; add rejects duplicate ids") {
    val store = new VectorStore(spark, tmp())
    val c1 = store.createOrGet("c")
    assert(c1.count() == 0)
    val n = docRows.count()
    c1.add(docRows)
    assert(store.createOrGet("c").count() == n, "create-or-get must not wipe data")
    c1.add(docRows) // all ids duplicate
    assert(c1.count() == n, "duplicate ids must be rejected")
    c1.add(docRows.withColumn("id", concat(lit("x"), col("id"))))
    assert(c1.count() == 2 * n, "fresh ids append")
  }

  test("add never broadcasts the store side (plan assert)") {
    val base = tmp()
    val store = new VectorStore(spark, base)
    val c = store.createOrGet("c")
    c.add(docRows)
    // The store's parquet scan must not sit under any BroadcastExchange: at
    // 100 TB that would ship the whole corpus id set to every executor on
    // every append (the r1 defect). Auto-broadcast is disabled so the tiny
    // test store can't be size-picked for broadcast the way a corpus never
    // would be — what remains is exactly the add() plan's HINTED broadcasts,
    // which must all be batch-derived.
    import org.apache.spark.sql.execution.SparkPlan
    def scansStore(p: SparkPlan): Boolean = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(base))
      case other => other.children.exists(scansStore)
    }
    def storeUnderBroadcast(p: SparkPlan): Boolean = p match {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => scansStore(b)
      case other => other.children.exists(storeUnderBroadcast)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = c.freshRows(docRows).queryExecution.sparkPlan
      assert(scansStore(plan), "sanity: the plan reads the store at all")
      assert(!storeUnderBroadcast(plan),
        s"store-side file scan under a BroadcastExchange:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // and the dedup result is still exact
    assert(c.freshRows(docRows).count() == 0, "all ids collide -> nothing fresh")
    val half = docRows.withColumn("id",
      when(col("id").cast("long") % 2 === 0, concat(lit("x"), col("id"))).otherwise(col("id")))
    assert(c.freshRows(half).count() == half.filter(col("id").startsWith("x")).count())
  }

  test("point-get, include-projection, full extraction") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val pt = c.get(ids = Seq("3", "7"), include = Seq("doc"))
    assert(pt.columns.toSeq == Seq("id", "doc"))
    assert(pt.count() == 2)
    assert(c.get().count() == docRows.count(), "no ids -> full extraction (the leak)")
  }

  test("get with where/whereDocument predicates and limit/offset paging") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val n = docRows.count()
    // predicate over the document column flows into the scan
    val pref = c.get(include = Seq("doc"),
      whereDocument = Some(col("doc").contains("spark")))
    val expect = docRows.filter(col("doc").contains("spark")).count()
    assert(pref.count() == expect && expect > 0 && expect < n)
    // metadata predicate composes with ids
    val both = c.get(ids = Seq("3", "7", "11"),
      where = Some(col("id") =!= "7"))
    assert(both.select("id").collect().map(_.getString(0)).toSet == Set("3", "11"))
    // deterministic id-ordered paging: pages tile the full extraction
    val all = c.get(include = Seq("doc")).orderBy("id")
      .collect().map(_.getString(0)).toSeq
    val paged = (0L until n by 4).flatMap(off =>
      c.get(include = Seq("doc"), limit = 4, offset = off.toInt)
        .collect().map(_.getString(0)))
    assert(paged == all, "limit/offset pages must tile the id-ordered extraction")
    assert(c.get(limit = 3).count() == 3)
    assert(c.get(offset = (n - 2).toInt).count() == 2)
  }

  test("query returns k nearest with distances; cosine and l2 metrics") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val qe = c.get(ids = Seq("0"), include = Seq("emb")).head().getSeq[Float](1).toArray
    val l2 = c.query(qe, 3, "l2").collect()
    assert(l2.length == 3)
    assert(l2.head.getString(0) == "0", "nearest to own vector is itself")
    assert(l2.head.getDouble(2) == 0.0)
    assert(l2.map(_.getDouble(2)).toSeq.sorted == l2.map(_.getDouble(2)).toSeq)
    val cos = c.query(qe, 3, "cosine").collect()
    assert(cos.head.getString(0) == "0")
    intercept[IllegalArgumentException](c.query(qe, 3, "hamming"))
  }

  test("upsert replaces existing rows and appends new ones") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val n = docRows.count()
    val batch = docRows.limit(5).withColumn("doc", lit("UPDATED"))
      .unionByName(docRows.limit(3).withColumn("id", concat(lit("new"), col("id")))
        .withColumn("doc", lit("INSERTED")))
    c.upsert(batch)
    assert(c.count() == n + 3, "upsert: 5 replaced in place, 3 appended")
    assert(c.df.filter(col("doc") === "UPDATED").count() == 5)
    assert(c.df.filter(col("doc") === "INSERTED").count() == 3)
  }

  test("update touches only existing ids; unknown ids are ignored") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val n = docRows.count()
    val batch = docRows.limit(4).withColumn("doc", lit("UPDATED"))
      .unionByName(docRows.limit(2).withColumn("id", concat(lit("ghost"), col("id"))))
    c.update(batch)
    assert(c.count() == n, "update must never change cardinality")
    assert(c.df.filter(col("doc") === "UPDATED").count() == 4)
    assert(c.df.filter(col("id").startsWith("ghost")).count() == 0)
  }

  test("delete by ids and by predicate; store stays readable after each swap") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    c.add(docRows)
    val n = docRows.count()
    c.delete(Seq("1", "2", "nonexistent"))
    assert(c.count() == n - 2)
    assert(c.get(ids = Seq("1", "2")).count() == 0)
    c.deleteWhere(col("id").cast("long") % 2 === 0)
    assert(c.df.filter(col("id").cast("long") % 2 === 0).count() == 0)
    val qe = c.get(ids = Seq("3"), include = Seq("emb")).head().getSeq[Float](1).toArray
    assert(c.query(qe, 3, "l2").head().getString(0) == "3",
      "query must still work over the rewritten store")
  }

  test("compact merges small files without changing contents") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("c")
    // several append cycles -> many small parquet files
    c.add(docRows.filter(col("id").cast("long") % 3 === 0))
    c.add(docRows.filter(col("id").cast("long") % 3 === 1))
    c.add(docRows.filter(col("id").cast("long") % 3 === 2))
    val before = c.df.orderBy("id").collect()
    def nFiles = c.df.inputFiles.length
    assert(nFiles > 2, s"expected many small files, got $nFiles")
    c.compact(2)
    assert(nFiles <= 2, s"compact(2) left $nFiles files")
    assert(c.df.orderBy("id").collect().toSeq == before.toSeq,
      "compaction must not change contents")
  }

  test("query honors where / whereDocument predicates before scoring") {
    val base = tmp()
    val store = new VectorStore(spark, base)
    val coll = store.createOrGet("filtered")
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"),
        concat(lit("doc"), col("vec_id"), lit(" topic"), pmod(col("vec_id"), lit(3))).as("doc"),
        map(lit("label"), col("label").cast("string")).as("meta"),
        col("embedding").as("emb"))
    coll.add(rows)
    val qe = rows.filter(col("id") === "0").head().getSeq[Float](3).toArray
    // whereDocument: only docs containing "topic1" may appear
    val byDoc = coll.query(qe, k = 5, whereDocument = Some(col("doc").contains("topic1")))
      .collect()
    assert(byDoc.nonEmpty && byDoc.forall(_.getString(1).contains("topic1")))
    // where: metadata predicate over the meta map
    val byMeta = coll.query(qe, k = 5, where = Some(element_at(col("meta"), "label") === "2"))
      .collect()
    assert(byMeta.nonEmpty)
    val labelOf = rows.select(col("id"), element_at(col("meta"), "label").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byMeta.forall(r => labelOf(r.getString(0)) == "2"))
    // unfiltered query is a superset ranking: its top hit (the probe itself)
    // outranks anything the filters kept
    assert(coll.query(qe, k = 1).head().getString(0) == "0")
  }

  test("snapshots: immutable reads survive upserts, deletes, and compaction") {
    val base = tmp()
    val store = new VectorStore(spark, base)
    val coll = store.createOrGet("versioned")
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"),
        concat(lit("d"), col("vec_id")).as("doc"),
        map(lit("k"), lit("v")).as("meta"), col("embedding").as("emb"))
    coll.add(rows)
    val before = coll.df.orderBy("id").collect().map(_.toSeq).toSeq

    coll.snapshot("v1")
    assert(coll.listSnapshots() == Seq("v1"))

    // mutate the live collection every way the CoW path allows
    coll.delete(Seq("1", "2", "3"))
    coll.upsert(rows.limit(5).withColumn("doc", lit("REWRITTEN")))
    coll.compact(2)
    assert(coll.df.filter(col("doc") === "REWRITTEN").count() == 5)

    // the snapshot still reads the original contents, bit for bit
    val snap = coll.readSnapshot("v1").orderBy("id").collect().map(_.toSeq).toSeq
    assert(snap == before, "snapshot must be immutable under live mutations")

    // snapshots are independent: a second tag sees the new state
    coll.snapshot("v2")
    assert(coll.listSnapshots() == Seq("v1", "v2"))
    assert(coll.readSnapshot("v2").filter(col("doc") === "REWRITTEN").count() == 5)
    coll.dropSnapshot("v1")
    assert(coll.listSnapshots() == Seq("v2"))
  }

  test("listCollections / renameCollection / peek (Chroma client parity)") {
    val store = new VectorStore(spark, tmp())
    store.createOrGet("beta")
    store.createOrGet("alpha")
    assert(store.listCollections() == Seq("alpha", "beta"))
    val a = store.createOrGet("alpha")
    a.add(docRows)
    a.snapshot("v1")
    val renamed = store.renameCollection("alpha", "gamma")
    assert(store.listCollections() == Seq("beta", "gamma"))
    assert(renamed.count() == docRows.count(), "rename preserves contents")
    assert(renamed.listSnapshots() == Seq("v1"), "snapshots move with the collection")
    intercept[IllegalArgumentException](store.renameCollection("alpha", "x"))
    intercept[IllegalArgumentException](store.renameCollection("beta", "gamma"))
    val p = renamed.peek(3)
    assert(p.count() == 3)
    assert(p.collect().map(_.getString(0)).toSeq ==
      renamed.df.select("id").orderBy("id").limit(3).collect().map(_.getString(0)).toSeq)
    // dropping a collection removes its snapshots too: a later rename onto
    // the dropped name must NOT inherit dead snapshot data
    val g2 = store.createOrGet("doomed")
    g2.add(docRows.limit(5))
    g2.snapshot("dead")
    store.dropCollection("doomed")
    val moved = store.renameCollection("gamma", "doomed")
    assert(moved.listSnapshots() == Seq("v1"),
      "renamed collection must carry ONLY its own snapshots")
  }

  test("encrypted store: incremental add rejects duplicate ids") {
    val enc = new EncryptedStore(spark, tmp(), "0123456789abcdef")
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"),
        concat(lit("d"), col("vec_id")).as("doc"), col("embedding").as("emb"))
    val n = rows.count()
    enc.store(rows.filter(col("id").cast("long") < n / 2), "v")
    enc.add(rows, "v") // half duplicate, half fresh
    val opened = enc.open("v")
    assert(opened.count() == n, "dups rejected, fresh appended")
    assert(opened.select("id").distinct().count() == n)
    // round-trip still exact for both the original and appended halves
    val bad = opened.join(rows.select(col("id"), col("emb").as("orig")), "id")
      .filter(not(col("emb") === col("orig"))).count()
    assert(bad == 0)
  }

  test("encrypted store: round-trip identity, unique IVs, useless without key") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"),
        concat(lit("d"), col("vec_id")).as("doc"), col("embedding").as("emb"))
    enc.store(rows, "v")

    // round-trip identity
    val back = enc.open("v").select(col("id"), col("emb"))
      .join(rows.select(col("id"), col("emb").as("orig")), "id")
      .filter(not(col("emb") === col("orig")))
    assert(back.count() == 0, "decrypt(encrypt(x)) must equal x exactly")

    // GCM random IV -> every ciphertext distinct even for equal plaintexts
    val ct = enc.extractSecure("v")
    assert(ct.select("emb_ct").distinct().count() == ct.count())

    // without the key the extraction is useless: wrong-key decrypt -> null
    val stolen = ct.withColumn("attempt",
      expr("try_aes_decrypt(emb_ct, 'ffffffffffffffff', 'GCM')"))
    assert(stolen.filter(col("attempt").isNotNull).count() == 0)

    // kNN over decrypted view works for key holders
    val qe = rows.filter(col("id") === "0").head().getSeq[Float](2).toArray
    val knn = enc.query("v", qe, 3).collect()
    assert(knn.head.getString(0) == "0" && knn.head.getDouble(2) == 0.0)
  }

  test("encrypted store: key rotation re-encrypts in place; old key locked out") {
    val base = tmp()
    val oldKey = "0123456789abcdef"; val newKey = "fedcba9876543210"
    val enc = new EncryptedStore(spark, base, oldKey)
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"),
        concat(lit("d"), col("vec_id")).as("doc"), col("embedding").as("emb"))
    enc.store(rows, "v")
    val before = enc.open("v").orderBy("id").collect().map(_.toSeq).toSeq

    val rotated = enc.rotateKey("v", newKey)

    // contents identical under the new key
    val after = rotated.open("v").orderBy("id").collect().map(_.toSeq).toSeq
    assert(after == before, "rotation must preserve every row")
    // the old key no longer decrypts anything
    val stale = rotated.extractSecure("v").withColumn("attempt",
      expr(s"try_aes_decrypt(emb_ct, '$oldKey', 'GCM')"))
    assert(stale.filter(col("attempt").isNotNull).count() == 0,
      "old key must be locked out after rotation")
    // and kNN still answers for the new key holder
    val qe = rows.filter(col("id") === "0").head().getSeq[Float](2).toArray
    assert(rotated.query("v", qe, 1).head().getString(0) == "0")
  }

  test("collection metadata: get_or_create keeps existing, modify replaces, rename carries") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("m", Map("owner" -> "team a", "tier" -> "hot"))
    assert(c.metadata == Map("owner" -> "team a", "tier" -> "hot"))
    // chroma get_or_create contract: existing metadata kept, argument ignored
    assert(store.createOrGet("m", Map("owner" -> "other")).metadata ==
      Map("owner" -> "team a", "tier" -> "hot"))
    // modify REPLACES the whole dict (not a merge); separator/control chars survive
    c.modify(metadata = Map("owner" -> "b\tc\nd", "k=1" -> "v 2"))
    assert(c.metadata == Map("owner" -> "b\tc\nd", "k=1" -> "v 2"))
    // rename carries rows + metadata; old name fully gone
    c.add(docRows.limit(3))
    val r = c.modify(newName = "m2")
    assert(r.metadata == Map("owner" -> "b\tc\nd", "k=1" -> "v 2"))
    assert(r.count() == 3)
    assert(store.listCollections() == Seq("m2"))
    // a fresh store instance over the same base reads the same metadata
    assert(new VectorStore(spark, store.basePath).createOrGet("m2").metadata ==
      Map("owner" -> "b\tc\nd", "k=1" -> "v 2"))
    // drop removes metadata: a later same-name collection starts clean
    store.dropCollection("m2")
    assert(store.createOrGet("m2").metadata.isEmpty)
  }

  test("getPage keyset pagination: every row exactly once, pushed range predicate") {
    val store = new VectorStore(spark, tmp())
    val c = store.createOrGet("pg")
    c.add(docRows)
    val all = c.df.select("id").collect().map(_.getString(0)).sorted.toSeq
    // walk pages of 7 until exhausted
    var after: String = null
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = c.getPage(after, pageSize = 7).select("id").collect().map(_.getString(0))
    while (page.nonEmpty) {
      seen ++= page
      after = page.last
      page = c.getPage(after, pageSize = 7).select("id").collect().map(_.getString(0))
    }
    assert(seen.toSeq == all, "pagination must visit every row exactly once, in id order")
    // the range predicate reaches the scan; the page sort is TakeOrdered
    val plan = c.getPage("m", pageSize = 7).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id"),
      s"afterId must push down as a range filter:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"page sort must TakeOrdered:\n$plan")
    // filters compose, and the JSON dialect form matches the Column form
    val viaCol = c.getPage(null, 1000,
      where = Some(element_at(col("meta"), lit("lang")) === "en"))
      .select("id").collect().map(_.getString(0)).toSeq
    assert(viaCol.nonEmpty)
    val viaJson = c.getPageJson(null, 1000, whereJson = """{"lang": "en"}""")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(viaJson == viaCol)
  }
}
