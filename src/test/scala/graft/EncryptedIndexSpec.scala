package graft

import graft.store.EncryptedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Encrypted vector SEARCH — the reference's core promise
 * (cyborgdb_store.py:1-11), not just encrypted storage: ciphertext rows
 * cell-partitioned by a trained IVF assignment, an ENCRYPTED centroid
 * sidecar, and a query path that reads only probed partitions and
 * decrypts only those rows. Pinned here: full-probe == brute force,
 * partition pruning in the physical plan, key-less uselessness, delete /
 * compact / rotation preserving the indexed layout.
 */
class EncryptedIndexSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private val Key = "0123456789abcdef"

  private def rowsOf(r: Range) = r.map(i => (s"id$i", s"doc $i",
    Array.tabulate(64)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)))
    .toDF("id", "doc", "emb")

  private def probe(i: Int): Array[Float] =
    Array.tabulate(64)(j => ((i * 37 + j * 11) % 101).toFloat / 101f)

  private def got(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double)] =
    df.select("id", "doc", "distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq

  test("full-probe indexed query equals the brute-force decrypt path; pruned probe is partition-pruned") {
    val base = tmp("enc_idx")
    val es = new EncryptedStore(spark, base, Key)
    es.storeIndexed(rowsOf(1 to 300), "c", numCells = 6)

    val brute = got(es.query("c", probe(7), k = 10))
    val full = got(es.queryIndexed("c", probe(7), k = 10, nprobe = 6))
    assert(full == brute, "full-probe indexed query must equal brute force")

    val pruned = es.queryIndexed("c", probe(7), k = 10, nprobe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.contains("PartitionFilters: [isnotnull(cell"),
      s"expected cell partition filters in:\n$plan")
    // IVF semantics: the pruned answer is exact within its probed cells —
    // every returned id must appear in the full-probe answer's corpus
    val prunedRows = got(pruned)
    assert(prunedRows.nonEmpty && prunedRows.map(_._3) == prunedRows.map(_._3).sorted)

    // without the key: ciphertext extraction works, search is useless
    val wrong = new EncryptedStore(spark, base, "ffffffffffffffff")
    assert(wrong.extractSecure("c").count() == 300,
      "ciphertext extraction must not need the true key")
    val ex = intercept[Exception] {
      wrong.queryIndexed("c", probe(7), k = 5, nprobe = 6).collect()
    }
    assert(ex != null, "wrong-key indexed query must fail, not return garbage")
  }

  test("delete, compact, and key rotation preserve the indexed layout and answers") {
    val es = new EncryptedStore(spark, tmp("enc_idx2"), Key)
    es.storeIndexed(rowsOf(1 to 200), "c", numCells = 4)
    val before = got(es.queryIndexed("c", probe(5), k = 8, nprobe = 4))

    // delete a served id: every surface stops serving it immediately
    val victim = before.head._1
    es.delete("c", Seq(victim))
    val after = got(es.queryIndexed("c", probe(5), k = 8, nprobe = 4))
    assert(!after.exists(_._1 == victim), "deleted id must vanish from indexed queries")
    assert(after.take(before.size - 1) == before.tail,
      "surviving rows keep their relative order after the delete")

    // compact: physical purge, partition pruning still in the plan
    es.compact("c")
    val postCompact = es.queryIndexed("c", probe(5), k = 8, nprobe = 2)
    val plan = postCompact.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.contains("PartitionFilters: [isnotnull(cell"),
      s"compaction must keep the cell partitioning:\n$plan")
    assert(got(es.queryIndexed("c", probe(5), k = 8, nprobe = 4)) == after,
      "compaction must not change answers")

    // rotation: same answers under the new key, old key locked out,
    // pruning intact
    val es2 = es.rotateKey("c", "fedcba9876543210")
    assert(got(es2.queryIndexed("c", probe(5), k = 8, nprobe = 4)) == after,
      "rotated store must serve identical answers")
    val plan2 = es2.queryIndexed("c", probe(5), k = 8, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("PartitionFilters: [cell#") ||
      plan2.contains("PartitionFilters: [isnotnull(cell"),
      s"rotation must keep the cell partitioning:\n$plan2")
    intercept[Exception] { got(es.queryIndexed("c", probe(5), k = 8, nprobe = 4)) }
  }
}
