package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Maximal Marginal Relevance selection over a bounded candidate
  * pool: greedily pick `k` items maximizing
  * `lambda * rel - (1 - lambda) * max_{s in selected} cos(cand, s)`,
  * ties broken by lower id — the Carbonell & Goldstein (SIGIR 1998)
  * re-ranking that trades relevance against redundancy.
  *
  * Input rows are `(id, rel, unit-vector)`; the CALLER bounds the
  * pool (Vector.mmrTopK limits to `poolSize` rows before
  * aggregating), so the buffer is candidate-pool-sized by contract —
  * this is a re-RANKER over an already-retrieved pool, not a scan
  * aggregate. Pairwise cosines are in-order left folds over the unit
  * vectors, so every double here is bitwise-reproducible against an
  * ordered-SUM SQL twin.
  *
  * Output: `(rank, id, rel, mmr_score)` best-first.
  */
class MmrSelectAggregator(k: Int, lambda: Double)
    extends Aggregator[(Long, Double, Seq[Double]),
      Seq[(Long, Double, Seq[Double])],
      Seq[(Int, Long, Double, Double)]] {

  override def zero: Seq[(Long, Double, Seq[Double])] = Seq.empty

  override def reduce(
      buf: Seq[(Long, Double, Seq[Double])],
      in: (Long, Double, Seq[Double])
  ): Seq[(Long, Double, Seq[Double])] = buf :+ in

  override def merge(
      a: Seq[(Long, Double, Seq[Double])],
      b: Seq[(Long, Double, Seq[Double])]
  ): Seq[(Long, Double, Seq[Double])] = a ++ b

  override def finish(
      buf: Seq[(Long, Double, Seq[Double])]
  ): Seq[(Int, Long, Double, Double)] = {
    // deterministic working order (any order yields the same picks —
    // argmax ties break by id — but keep it canonical anyway)
    val pool = buf.sortBy { case (id, rel, _) => (-rel, id) }.toArray
    val n = pool.length
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      // in-order fold — matches SUM(... ORDER BY i) bitwise
      var s = 0.0
      var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { s += a(i) * b(i); i += 1 }
      s
    }
    // max cosine to the selected set — UNCLIPPED (a negative max is a
    // genuine diversity bonus); the empty-set convention is 0.0, so
    // the first pick is pure lambda-scaled relevance
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val taken = Array.fill(n)(false)
    val out = Seq.newBuilder[(Int, Long, Double, Double)]
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val ms = if (maxSim(i) == Double.NegativeInfinity) 0.0
            else maxSim(i)
          val score = lambda * pool(i)._2 - (1 - lambda) * ms
          if (best < 0 || score > bestScore ||
              (score == bestScore && pool(i)._1 < pool(best)._1)) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out += ((step + 1, pool(best)._1, pool(best)._2, bestScore))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = dot(pool(j)._3, pool(best)._3)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Seq[(Long, Double, Seq[Double])]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Double, Seq[Double])]]()

  override def outputEncoder: Encoder[Seq[(Int, Long, Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Int, Long, Double, Double)]]()
}
