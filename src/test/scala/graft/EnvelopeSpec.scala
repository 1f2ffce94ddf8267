package graft

import graft.store.{EncryptedStore, Envelope}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Envelope encryption: the wrapped-DEK key hierarchy over EncryptedStore.
 * Pinned here: master rotation touches ZERO data bytes (down to file
 * mtimes) yet locks the old master out instantly; data-key rotation
 * re-encrypts every row through the per-collection crash-consistent
 * commits and RESUMES from a crash at any stage; the master never has to
 * reach an executor because only the DEK keys Spark plans.
 */
class EnvelopeSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def tmp(tag: String): String =
    graft.store.Scratch.dir(s"graft_$tag")

  private val Master = "master-key-0123456789abcdef01234" // 32 bytes
  private val Master2 = "MASTER-key-0123456789abcdef01234"

  private def rowsOf(r: Range) = r.map(i => (s"id$i", s"doc $i",
    Array.tabulate(16)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)))
    .toDF("id", "doc", "emb")

  private def probe(i: Int): Array[Float] =
    Array.tabulate(16)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)

  private def answers(es: EncryptedStore, name: String): Seq[(String, Double)] =
    es.queryIndexed(name, probe(5), k = 5, nprobe = 4).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq

  /** (relative path -> (size, mtime)) of every file under base except the
    * key files themselves — the "no data bytes touched" fingerprint. */
  private def dataFingerprint(base: String): Map[String, (Long, Long)] = {
    val root = new java.io.File(base)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
    walk(root)
      .filterNot(f => f.getName.startsWith("__dek") ||
        f.getName.startsWith("_writer_lease"))
      .map(f => f.getPath.stripPrefix(root.getPath) ->
        (f.length(), f.lastModified()))
      .toMap
  }

  test("key length validates UTF-8 BYTES, not chars — a non-ASCII master fails diagnosably") {
    val base = tmp("env_utf8")
    // 16 chars, but 'é' widens to 2 UTF-8 bytes -> 17 key bytes: must fail
    // in requireKey with the byte-count message, not deep inside
    // Cipher.init with an opaque InvalidKeyException
    val nonAscii = "é" + "a" * 15
    assert(nonAscii.length == 16)
    val ex = intercept[IllegalArgumentException](Envelope.open(spark, base, nonAscii))
    assert(ex.getMessage.contains("BYTES") && ex.getMessage.contains("17"), ex.getMessage)
    // a 16-BYTE ascii master of the same char length still opens fine
    Envelope.open(spark, tmp("env_ascii"), "a" * 16).store(rowsOf(1 to 3), "c")
  }

  test("open initializes and reopens one keyspace; a wrong master fails loudly") {
    val base = tmp("env_open")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 80), "c", numCells = 4)
    val want = answers(es, "c")
    assert(want.nonEmpty)
    // a re-open unwraps the SAME DEK — answers identical
    assert(answers(Envelope.open(spark, base, Master), "c") == want)
    // the wrong master cannot unwrap (GCM tag, not a silent wrong key)
    val ex = intercept[IllegalArgumentException](
      Envelope.open(spark, base, Master2))
    assert(ex.getMessage.contains("master"))
    assert(Envelope.verifies(base, Master) && !Envelope.verifies(base, Master2))
  }

  test("rotateMaster: zero data bytes touched, old master locked out, answers identical") {
    val base = tmp("env_rotm")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 80), "c", numCells = 4)
    es.store(rowsOf(81 to 90), "plain")
    val want = answers(es, "c")
    val fp = dataFingerprint(base)

    Envelope.rotateMaster(base, Master, Master2)

    assert(dataFingerprint(base) == fp,
      "master rotation must not touch a single data byte (sizes AND mtimes)")
    assert(!Envelope.verifies(base, Master), "old master must be locked out")
    val es2 = Envelope.open(spark, base, Master2)
    assert(answers(es2, "c") == want, "the new master serves identical answers")
    assert(es2.extractSecure("plain").count() == 10)
    // rotating with the wrong old master fails loudly
    intercept[IllegalArgumentException](
      Envelope.rotateMaster(base, Master, Master2))
  }

  test("rotateData: fresh DEK re-encrypts every collection; answers preserved") {
    val base = tmp("env_rotd")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 80), "c", numCells = 4)
    es.store(rowsOf(81 to 90), "plain")
    val want = answers(es, "c")
    def sampleCt(name: String): Seq[Byte] =
      spark.read.parquet(s"$base/$name")
        .filter(org.apache.spark.sql.functions.col("id") === "id81")
        .select("doc_ct").collect().headOption
        .map(_.getAs[Array[Byte]](0).toSeq).getOrElse(Seq.empty)
    val ctBefore = sampleCt("plain")
    assert(ctBefore.nonEmpty)

    val es2 = Envelope.rotateData(spark, base, Master, Seq("c", "plain"))

    assert(answers(es2, "c") == want, "rotation must preserve every answer")
    assert(es2.extractSecure("plain").count() == 10)
    assert(sampleCt("plain") != ctBefore, "ciphertext must actually change (fresh DEK + IVs)")
    // the promoted state is clean: master still verifies, re-open serves
    assert(Envelope.verifies(base, Master))
    assert(answers(Envelope.open(spark, base, Master), "c") == want)
    // the OLD DEK's store can no longer read a row (GCM failure at decrypt)
    intercept[Exception] {
      answers(es, "c")
    }
  }

  test("rotateData crash-resume: intent-only and mid-rewrite crashes both heal at open()") {
    val base = tmp("env_crash")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 60), "c1", numCells = 4)
    es.storeIndexed(rowsOf(61 to 120), "c2", numCells = 4)
    val want1 = answers(es, "c1")
    val want2 = answers(es, "c2")

    // crash A: intent landed, nothing rotated — open() must resume
    val oldDek = Envelope.currentDek(base, Master)
    val newDek = Envelope.stageDataRotation(base, Master, Seq("c1", "c2"))
    // rotateMaster refuses while a rotation is pending
    intercept[IllegalArgumentException](
      Envelope.rotateMaster(base, Master, Master2))
    // crash B (deeper): one collection already rewritten before the crash
    new EncryptedStore(spark, base, oldDek).rotateKey("c1", newDek): Unit

    val healed = Envelope.open(spark, base, Master)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base, "__dek_next")),
      "resume must promote and clear the pending record")
    assert(Envelope.currentDek(base, Master) == newDek, "the staged DEK must be THE key now")
    assert(answers(healed, "c1") == want1 && answers(healed, "c2") == want2,
      "both the pre-crash-rotated and the pending collection must serve identically")
    // resume is idempotent: a second open changes nothing
    assert(answers(Envelope.open(spark, base, Master), "c2") == want2)
  }

  test("stale-handle fence: a pre-rotation store handle refuses writes after rotateData") {
    val base = tmp("env_fence")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 60), "c", numCells = 4)
    val es2 = Envelope.rotateData(spark, base, Master, Seq("c"))
    // the OLD handle's DEK rotated away: mutations refuse loudly instead
    // of landing old-key ciphertext into the rotated collection
    val ex = intercept[IllegalArgumentException](
      es.delete("c", Seq("id1")))
    assert(ex.getMessage.contains("stale envelope handle"))
    // the fresh handle mutates fine; reads on the old handle were never
    // the hazard (they fail at decrypt, loudly)
    es2.delete("c", Seq("id1"))
    assert(!es2.queryIndexed("c", probe(5), k = 60, nprobe = 4).collect()
      .exists(_.getString(0) == "id1"))
    // mid-rotation (pending intent), even a CURRENT-dek handle refuses
    val es3 = Envelope.open(spark, base, Master)
    Envelope.stageDataRotation(base, Master, Seq("c")): Unit
    val ex2 = intercept[IllegalArgumentException](es3.delete("c", Seq("id2")))
    assert(ex2.getMessage.contains("rotation is in progress"))
    Envelope.open(spark, base, Master): Unit // resume + promote cleans up
    // an envelope-managed handle cannot bypass the envelope with a direct
    // per-collection rotation (it would diverge from the wrapped DEK)
    val ex3 = intercept[IllegalArgumentException](
      Envelope.open(spark, base, Master).rotateKey("c", "0123456789abcdef"))
    assert(ex3.getMessage.contains("envelope-managed"))
  }

  test("verifies never throws; purge-everything composes with data rotation") {
    // missing envelope / wrong-length master: false, not an exception
    assert(!Envelope.verifies(tmp("env_none"), Master))
    assert(!Envelope.verifies(tmp("env_none2"), "short"))
    // a fully-purged indexed collection still data-rotates (sidecars
    // re-encrypt; the footerless row tree serves empty under the new DEK)
    val base = tmp("env_purged")
    val es = Envelope.open(spark, base, Master)
    es.storeIndexed(rowsOf(1 to 40), "c", numCells = 4)
    es.delete("c", (1 to 40).map(i => s"id$i"))
    es.compact("c")
    val es2 = Envelope.rotateData(spark, base, Master, Seq("c"))
    assert(es2.queryIndexed("c", probe(5), k = 3, nprobe = 4).isEmpty)
    assert(es2.extractSecure("c").isEmpty)
    assert(Envelope.verifies(base, Master))
    // empty-is-canonical applies only to collections that EXIST: a typo'd
    // name stays a loud error, never an empty answer
    intercept[Exception](es2.extractSecure("tpyo").collect())
  }

  test("rotateData validates names BEFORE the durable intent lands") {
    val base = tmp("env_names")
    val es = Envelope.open(spark, base, Master)
    es.store(rowsOf(1 to 5), "real")
    intercept[IllegalArgumentException](
      Envelope.rotateData(spark, base, Master, Seq("real", "no_such")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base, "__dek_next")),
      "a rejected rotation must leave no pending record to wedge open()")
    // the store still opens and serves
    assert(Envelope.open(spark, base, Master).extractSecure("real").count() == 5)
  }
}
