package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("as-of semantics: latest at-or-before, null when none, per-key isolation") {
    val left = Seq(
      (1L, 100L, 10L), // k=100: rights at 5, 10 -> tie picks 10 (inclusive)
      (2L, 100L, 7L),  // -> 5
      (3L, 100L, 4L),  // before all rights -> null
      (4L, 200L, 50L), // k=200: right at 20 -> 20
      (5L, 300L, 50L)  // key with no rights -> null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (100L, 5L, "r5"), (100L, 10L, "r10"), (200L, 20L, "r20")
    ).toDF("k", "t", "tag")

    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "last_tag"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3))))

    assert(out.toSeq == Seq(
      (1L, Some("r10")), (2L, Some("r5")), (3L, None), (4L, Some("r20")), (5L, None)))
  }

  test("multiple value columns ride along") {
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "k", "t")
    val right = Seq((1L, 8L, "x", 3.5)).toDF("k", "t", "tag", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "tag", "v" -> "v")).head()
    assert(out.getString(3) == "x" && out.getDouble(4) == 3.5)
  }
}
