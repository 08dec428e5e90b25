package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap per-key top-k as a typed `Aggregator` — the
  * scale-path alternative to the `row_number` window formulation
  * (W1 per-key variant, SURVEY §2.5).
  *
  * A window sort shuffles EVERY row to its key's partition and sorts
  * them all; this aggregator keeps at most k elements per key in each
  * map-side partial, so the shuffle carries at most k rows per (key,
  * input partition) — the difference between shuffling the whole
  * table and shuffling k×keys rows at 100 TB.
  *
  * Ranking: descending by `_1` (value), ties broken by ascending `_2`
  * (id) — matching `ORDER BY value DESC, id`. Output is the sorted
  * top-k as array<struct>, explodable back to rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Long, Long)] = Nil

  // keep the buffer sorted best-first and capped at k
  private def insert(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] = {
    val (front, back) = buf.span(e => better(e, in))
    val merged = front ::: in :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] =
    insert(buf, in)

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
