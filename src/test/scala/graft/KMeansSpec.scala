package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite with SparkTest {

  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("emb"))
    .orderBy("id").persist()

  test("Lloyd iterations monotonically decrease inertia; training is reproducible") {
    val inertias = (0 to 3).map { iters =>
      KMeans.inertia(vecs, "emb", KMeans.train(vecs, "emb", k = 8, iters = iters))
    }
    info("inertia by iteration count: " + inertias.map(d => f"$d%.1f").mkString(" -> "))
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"Lloyd round increased inertia: $a -> $b")
    }
    assert(inertias.last < inertias.head, "training must actually improve on the seeds")
    val a = KMeans.train(vecs, "emb", k = 8, iters = 2)
    val b = KMeans.train(vecs, "emb", k = 8, iters = 2)
    assert(a.map { case (i, v) => (i, v.toSeq) }.toSeq == b.map { case (i, v) => (i, v.toSeq) }.toSeq)
  }

  test("assignment covers every row with a valid cluster id") {
    val cents = KMeans.train(vecs, "emb", k = 8, iters = 2)
    val cells = vecs.withColumn("cell", KMeans.assign(col("emb"), cents))
    assert(cells.filter(col("cell") < 0 || col("cell") >= 8).count() == 0)
    // all clusters non-trivially populated on this corpus
    assert(cells.select("cell").distinct().count() == 8)
  }

  test("distributed farthest-first seeding is bit-identical to the driver arm") {
    // the size dispatch must never change the chosen seeds: run BOTH arms
    // on the same input (the distributed arm forced explicitly) and
    // compare ids and vectors exactly. The distributed arm is the O(k·N)
    // incremental-min rewrite — the r7 fix for the O(k²·N) per-round
    // recompute that stalled 97-cell seeding at 200k rows.
    val viaDispatch = KMeans.farthestFirstSeeds(vecs, "id", "emb", 16) // driver (N small)
    val distributed = KMeans.farthestFirstDistributed(vecs, "id", "emb", 16)
    assert(distributed.map(_._1).toSeq == viaDispatch.map(_._1).toSeq,
      "both arms must choose the same seed ids")
    assert(distributed.zip(viaDispatch).forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq },
      "both arms must carry identical seed vectors")
  }
}
