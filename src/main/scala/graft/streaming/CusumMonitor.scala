package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Audit.cusumShift` — per-feed two-sided CUSUM
  * level-shift monitoring as keyed state, for the live feed-health
  * alarm the batch op computes retrospectively: the batch form
  * derives its reference level from the whole series (and collapses
  * the recurrence to two windows); a MONITOR cannot see the future,
  * so here the caller supplies the reference level `meanX` (the
  * standard CUSUM operating contract — a known in-control baseline,
  * e.g. last month's batch `mean_x`) and the recurrence runs
  * incrementally: state per feed is just the two cumulative sums
  * `(s_hi, s_lo)`, updated per bucket and emitted with alarm flags.
  *
  * Input contract: pre-bucketed counts `(feed, bucket, x)` arriving
  * in per-feed bucket order across micro-batches (the shape a
  * watermarked windowed count emits in append mode); within one
  * micro-batch rows are sorted by bucket before folding, so
  * intra-batch disorder is absorbed. All arithmetic matches the
  * batch op exactly — same floor-divided `k`/`h` in milli of the
  * baseline — which is what makes the two differentially testable
  * (StreamingSpec replays a series through both and asserts
  * identical `s_hi`/`s_lo`/alarm columns).
  *
  * Shape at scale: state is 2 longs per feed (bounded by the feed
  * domain, not the stream); each micro-batch shuffles only its own
  * bucket rows to their feed's state partition.
  */
object CusumMonitor {

  case class Bucket(feed: String, bucket: Long, x: Long)
  case class CusumState(sHi: Long, sLo: Long)
  case class CusumOut(feed: String, bucket: Long, x: Long,
      s_hi: Long, s_lo: Long, alarm_hi: Boolean, alarm_lo: Boolean)

  def monitor(
      buckets: Dataset[Bucket],
      meanX: Long,
      kMilli: Long = 100L,
      hMilli: Long = 4000L
  )(implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._
    require(meanX >= 0 && kMilli >= 0 && hMilli > 0,
      s"baseline/allowance/threshold invalid: $meanX/$kMilli/$hMilli")
    val k = meanX * kMilli / 1000
    val h = meanX * hMilli / 1000
    buckets
      .groupByKey(_.feed)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (feed: String, rows: Iterator[Bucket],
         state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = rows.toSeq.sortBy(_.bucket).map { b =>
            val sh = math.max(0L, st.sHi + b.x - meanX - k)
            val sl = math.max(0L, st.sLo + meanX - b.x - k)
            st = CusumState(sh, sl)
            CusumOut(feed, b.bucket, b.x, sh, sl, sh > h, sl > h)
          }
          state.update(st)
          out.iterator
      }
  }
}
