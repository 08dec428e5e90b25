package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch buffer: the k smallest DISTINCT hash
  * values per key, kept as a sorted ascending list with map-side
  * partials (the [[TopKAggregator]] shuffle contract — at most k
  * values per (key, input partition) ride the exchange, never the
  * stream itself).
  *
  * Unlike HLL this sketch is a pure order statistic, so it is
  * bit-deterministic for a given input SET on any engine or
  * partitioning — duplicates collapse on insert, merge is the same
  * insert fold, and "k smallest distinct per partition, merged" is
  * exactly "k smallest distinct globally". That is what lets a KMV
  * estimate be oracle-checked where an HLL can only be spec-checked.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: List[Long] = Nil

  private def insert(buf: List[Long], h: Long): List[Long] = {
    val (front, back) = buf.span(_ < h)
    back match {
      case hd :: _ if hd == h => buf // already present: distinct semantics
      case _ =>
        val merged = front ::: h :: back
        if (merged.length > k) merged.take(k) else merged
    }
  }

  override def reduce(buf: List[Long], h: Long): List[Long] = insert(buf, h)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
