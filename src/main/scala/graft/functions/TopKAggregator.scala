package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed mergeable top-k aggregator (UDAF surface, SURVEY §2.6):
  * keeps the k largest (value, id) pairs per group; merge combines
  * partial top-k lists, so partial aggregation works map-side and the
  * shuffle carries at most k pairs per group — the scale-correct
  * per-group top-k when k is small and groups are many (the window
  * row_number form materializes full partitions; this form never
  * holds more than k rows per group per task).
  *
  * Deterministic total order: value DESC, then id ASC as tiebreak.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(
      buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val merged = (buf :+ x).sortWith(better)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(
      buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(
      a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val merged = (a ++ b).sortWith(better)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
