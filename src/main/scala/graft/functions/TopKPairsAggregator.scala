package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]] variant whose finish keeps the (value, id)
  * pairs (best-first) instead of projecting to ids — the form batch
  * similarity search needs, where the score column travels to the
  * result. Same mergeable contract: partial aggregation keeps ≤ k
  * pairs per group per task, so the shuffle never carries full
  * score lists.
  *
  * Deterministic total order: value DESC, then id ASC as tiebreak.
  */
class TopKPairsAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

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

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
}
