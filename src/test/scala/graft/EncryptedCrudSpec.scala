package graft

import graft.store.EncryptedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * CRUD parity on the ENCRYPTED twin (round-6 verdict item 6): the
 * reference's whole thesis is the encrypted path
 * (/root/reference/src/cyborgdb_store.py:1-11), so the GDPR story must
 * hold there too — delete/deleteWhere stop every read surface
 * immediately (ciphertext extraction included), compact purges the
 * ciphertext physically, and the pipeline composes with key rotation.
 */
class EncryptedCrudSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def tmp(): String =
    graft.store.Scratch.dir("graft_enccrud")

  private def rows(r: Range) = r.map(i =>
    (s"id$i", s"secret document $i",
      Array.tabulate(6)(j => (i * 13 + j).toFloat / 29f)))
    .toDF("id", "doc", "emb")

  test("delete excludes the id from every read surface immediately; compact purges physically") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    enc.store(rows(1 to 40), "c")
    enc.delete("c", Seq("id7", "id9", "idMISSING"))

    // every surface: ciphertext extraction, authorized read, kNN
    assert(enc.extractSecure("c").filter(col("id").isin("id7", "id9")).count() == 0,
      "post-delete extraction must serve NO ciphertext row for the id")
    assert(enc.open("c").filter(col("id").isin("id7", "id9")).count() == 0)
    val probe = Array.tabulate(6)(j => (7 * 13 + j).toFloat / 29f)
    assert(enc.query("c", probe, k = 5).filter(col("id") === "id7").count() == 0)
    // but the rows are still PHYSICALLY present until compact
    assert(spark.read.parquet(s"$base/c").filter(col("id") === "id7").count() == 1)

    enc.compact("c")
    assert(spark.read.parquet(s"$base/c").filter(col("id").isin("id7", "id9")).count() == 0,
      "compact must drop the ciphertext rows physically")
    assert(!new java.io.File(s"$base/__enc_tombstones/c").exists() ||
      new java.io.File(s"$base/__enc_tombstones/c").listFiles().isEmpty,
      "compact must clear the applied tombstone dirs")
    assert(enc.open("c").count() == 38)
  }

  test("deleteWhere derives ids from the decrypted view; unknown ids never tombstone") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    enc.store(rows(1 to 30), "c")
    enc.deleteWhere("c", col("doc").contains("document 12"))
    assert(enc.open("c").filter(col("id") === "id12").count() == 0)
    assert(enc.open("c").count() == 29)
    // a delete of only-unknown ids leaves an empty batch and changes nothing
    enc.delete("c", Seq("never-stored"))
    assert(enc.open("c").count() == 29)
    enc.compact("c")
    assert(enc.open("c").count() == 29)
  }

  test("re-adding a tombstoned id refuses loudly until compact; then sticks") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    enc.store(rows(1 to 10), "c")
    enc.delete("c", Seq("id3"))
    intercept[IllegalArgumentException] { enc.add(rows(3 to 3), "c") }
    enc.compact("c")
    enc.add(rows(3 to 3), "c")
    assert(enc.open("c").filter(col("id") === "id3").count() == 1,
      "a re-add after compact must be served")
  }

  test("encrypted snapshots pin rows AND pending-delete state; later purges don't reach them") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    enc.store(rows(1 to 25), "c")
    enc.delete("c", Seq("id4")) // pending at snapshot time: stays excluded
    enc.snapshot("c", "s1")
    // later mutations: delete + physical purge + new adds
    enc.delete("c", Seq("id10"))
    enc.compact("c")
    enc.add(rows(26 to 30), "c")
    val snap = enc.openSnapshot("c", "s1").select("id").collect()
      .map(_.getString(0)).toSet
    assert(!snap.contains("id4"), "pre-snapshot pending delete must hold in the snapshot")
    assert(snap.contains("id10"), "post-snapshot deletes must NOT reach the frozen view")
    assert(!snap.contains("id26"), "post-snapshot adds must NOT reach the frozen view")
    assert(snap.size == 24)
    // the documented GDPR contract: dropping the snapshot releases the refs
    enc.dropSnapshot("c", "s1")
    assert(!new java.io.File(s"$base/__enc_snapshots/c/s1").exists())
  }

  test("key rotation preserves pending tombstones; compact after rotation purges under the new key") {
    val base = tmp()
    val enc = new EncryptedStore(spark, base, "0123456789abcdef")
    enc.store(rows(1 to 20), "c")
    enc.delete("c", Seq("id5"))
    val enc2 = enc.rotateKey("c", "fedcba9876543210")
    assert(enc2.open("c").filter(col("id") === "id5").count() == 0,
      "the pending delete must survive key rotation")
    enc2.compact("c")
    assert(spark.read.parquet(s"$base/c").filter(col("id") === "id5").count() == 0)
    assert(enc2.open("c").count() == 19)
  }
}
