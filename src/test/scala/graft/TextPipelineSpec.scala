package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end properties of the training-data pipeline operators that are
  * easier to state as invariants than to eyeball in the oracle rows. */
class TextPipelineSpec extends AnyFunSuite with SparkTest {

  test("decontamination flags every canary'd doc and no benchmark doc leaks through") {
    val out = graft.queries.Registry.queries("q_decontaminate")(spark, sf001).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // benchmark docs are excluded from the output entirely
    assert(byId.keys.forall(_ % 89 != 0), "benchmark slice must not appear in the corpus output")
    // every canary'd corpus doc shares the canary's 8-grams with the bench slice
    val canaried = byId.keys.filter(id => id % 13 == 0).toSeq
    assert(canaried.nonEmpty)
    canaried.foreach { id =>
      val r = byId(id)
      assert(r.getBoolean(3), s"doc $id carries the canary but was not flagged")
      assert(r.getLong(2) >= 1, s"doc $id overlap count must be positive")
    }
    // contamination is a real subset, not everything
    val flagged = out.count(_.getBoolean(3))
    assert(flagged >= canaried.size && flagged < out.length,
      s"$flagged of ${out.length} flagged")
  }

  test("source quota keeps exactly the top-5 docs per source by (n_chars, doc_id)") {
    val out = graft.queries.Registry.queries("q_source_quota")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySource = out.groupBy(_._1)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    bySource.foreach { case (src, kept) =>
      assert(kept.length == 5, s"$src kept ${kept.length} docs")
      val want = docs.filter(_._1 == src).sortBy(d => (-d._3, d._2)).take(5)
        .map(d => (d._2, d._3)).toSeq
      assert(kept.sortBy(_._2).map(k => (k._3, k._4)).toSeq == want,
        s"$src quota must be the exact top-5")
    }
    assert(bySource.size == 20)
  }

  test("mixture plan: rates cap at 1, small sources upsample, budget is conserved") {
    val rows = graft.queries.Registry.queries("q_mixture_plan")(spark, sf001).collect()
    assert(rows.length == 20)
    val target = rows.head.getAs[Long]("target")
    rows.foreach { r =>
      assert(r.getAs[Long]("target") == target, "equal split: same target everywhere")
      val rate = r.getAs[Double]("rate")
      val epochs = r.getAs[Long]("epochs")
      val avail = r.getAs[Long]("avail")
      assert(rate > 0.0 && rate <= 1.0)
      assert(epochs >= 1L)
      // the two sides of the plan agree: a source upsamples (epochs > 1)
      // exactly when its availability falls short of the target
      assert((epochs > 1L) == (avail < target),
        s"${r.getAs[String]("source")}: epochs=$epochs avail=$avail target=$target")
    }
    // the per-source targets sum back to (no more than) the global budget
    val total = rows.map(_.getAs[Long]("avail")).sum
    assert(target * rows.length <= total / 2)
  }

  test("weighted sample: replays driver-side and selection tracks weight across salts") {
    import graft.functions.TextHashOps
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val M = 1048576L
    def key(salt: String, id: Long, w: Long): Double = {
      val h = TextHashOps.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$salt$id"))
      math.log((h % M + 0.5) / M.toDouble) / math.max(w, 1L).toDouble
    }
    def pick(salt: String): Seq[(String, Long)] = docs
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.map { case (id, _, w) => (id, BigDecimal(key(salt, id, w))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          .sortBy { case (id, k) => (-k, id) }.take(5).map(p => (src, p._1))
      }
    // the registered query IS the driver-side replication at salt "ws:"
    val got = graft.queries.Registry.queries("q_weighted_sample")(spark, sf001)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == pick("ws:").toSet, "query must equal the independent A-ES replication")
    // statistics: across many salts, the E-S sample must favor heavy docs —
    // mean selected weight well above the corpus mean (weight-proportional
    // inclusion is the operator's whole point; collapse here means the key
    // formula degenerated to uniform sampling)
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val salts = (0 until 30).map(i => s"salt$i:")
    val selMeans = salts.map { s =>
      val sel = pick(s).map(_._2).toSet
      val ws = docs.filter(d => sel.contains(d._1)).map(_._3)
      ws.sum.toDouble / ws.size
    }
    val meanSel = selMeans.sum / selMeans.size
    info(f"corpus mean n_chars = $corpusMean%.1f, mean selected = $meanSel%.1f over ${salts.size} salts")
    assert(meanSel > corpusMean * 1.1,
      s"weighted sample does not favor heavy docs: $meanSel vs corpus $corpusMean")
  }
}
