package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of equal-length `array<long>` rows — the moment
  * accumulator behind exact-integer covariance/Gram skeletons
  * (`Vector.pcaMomentsQ16`). Mergeable by construction (long adds are
  * associative and commutative and cannot lose precision), so partial
  * aggregation combines map-side and the shuffle carries ONE array
  * per group per task — never the row set. The empty buffer is the
  * zero element; the first row fixes the length, and mismatched
  * lengths fail loudly (a silent zip would truncate moments).
  */
class LongArraySumAggregator
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def addInto(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (b.isEmpty) a.toArray
    else {
      require(b.length == a.length,
        s"array length mismatch: ${b.length} vs ${a.length}")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    addInto(b, a)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y else addInto(x, y.toSeq)

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[Long]]()
}
