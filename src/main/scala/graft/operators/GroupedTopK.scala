package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/**
 * Grouped top-k as a typed Aggregator (UDAF with map-side partial
 * aggregation). The window-function formulation
 * (`row_number over (partition by g order by d) <= k`) shuffles EVERY input
 * row to its group's reducer; this aggregator keeps a bounded k-element
 * buffer per group per map task, so the shuffle carries at most
 * `k x groups x tasks` rows — the difference between "shuffle the corpus"
 * and "shuffle the answer" at 100 TB.
 *
 * Ordering is the total order (score, id) ascending — ties broken by id, so
 * results are deterministic under any partitioning, and merge is
 * associative/commutative (safe for AQE re-planning and speculative tasks).
 */
object GroupedTopK {

  case class Scored(score: Double, id: Long)

  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    // strictly-better under the SAME total order sortBy uses
    // (Double total ordering: -0.0 < 0.0, NaN last) — raw IEEE `<`/`==`
    // would let a NaN buffer tail block every later real candidate
    private def beats(a: Scored, w: Scored): Boolean = {
      val c = java.lang.Double.compare(a.score, w.score)
      c < 0 || (c == 0 && a.id < w.id)
    }

    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.length < k) (buf :+ a).sortBy(s => (s.score, s.id))
      else if (beats(a, buf.last)) (buf.init :+ a).sortBy(s => (s.score, s.id))
      else buf

    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = insert(b, a)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sortBy(s => (s.score, s.id)).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column aggregate: smallest-k (score, id) pairs per group, ascending. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]()).apply(score, id)

  /** [[topK]] carrying an arbitrary payload struct through the bounded
    * buffer ([[graft.functions.TopKRows]] — a native
    * TypedImperativeAggregate): the shuffle still moves at most
    * k × groups × tasks entries, each now `(score, id, payload)`, so a
    * serving path whose answer needs `include` columns never re-joins or
    * bit-packs them. Output `array<struct<score, id, payload>>` sorted by
    * the same (score, id) total order. */
  def topKRows(k: Int)(score: Column, id: Column, payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.TopKRows(
      Bridge.expression(score), Bridge.expression(id),
      Bridge.expression(payload), k).toAggregateExpression())
  }
}
