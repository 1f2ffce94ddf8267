package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"), maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle + pair + isolated self-loop resolve to min-id components") {
    val got = labelsOf(Seq((2L, 1L), (2L, 3L), (3L, 1L), (10L, 11L), (12L, 11L), (7L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 7L -> 7L))
  }

  test("long chain converges (diameter > 1 iterations) and labels by min id") {
    val chain = (20L until 30L).map(i => (i + 1, i)) // 30-29-...-20
    val got = labelsOf(chain)
    assert(got.keySet == (20L to 30L).toSet)
    assert(got.values.toSet == Set(20L))
  }

  test("maxIter bounds propagation (partial labels after one round)") {
    val chain = (0L until 6L).map(i => (i, i + 1))
    val got = labelsOf(chain, maxIter = 1)
    // after a single round vertex 6 can only have seen 5's initial label
    assert(got(6L) == 5L && got(1L) == 0L)
  }

  test("runAuto (driver union-find) agrees with the distributed loop") {
    var x = 98765L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val edges = Seq.fill(60)((next() % 40, next() % 40))
    val dist = labelsOf(edges)
    val auto = ConnectedComponents.runAuto(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == dist)
    // and the big-graph path routes through the distributed loop unchanged
    val viaDist = ConnectedComponents.runAuto(edges.toDF("src", "dst"), collectThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDist == dist)
  }

  test("matches transitive closure on a random-ish deterministic graph") {
    // edges from a fixed LCG: 40 edges over 30 vertices
    var x = 12345L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val edges = Seq.fill(40)((next() % 30, next() % 30))
    val got = labelsOf(edges)
    // brute-force closure on the driver
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = verts.map(v => v -> edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSet).toMap
    def component(v: Long): Long = {
      var seen = Set(v); var frontier = Set(v)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj(_)) -- seen
        seen ++= frontier
      }
      seen.min
    }
    assert(got == verts.map(v => v -> component(v)).toMap)
  }
}
