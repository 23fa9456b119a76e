package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Audit.freshnessDecay` — the live
  * recency-weighted event-mass a sampler reads ("what has this feed
  * been producing LATELY") maintained incrementally: state per feed
  * is ONE long (the decayed ppm mass) plus the day it was valid for;
  * on a day rollover the whole mass halves once per elapsed day
  * (integer shift — `floor(floor(x/2)/2) = floor(x/4)`, so chained
  * halvings equal one `div 2^gap` exactly), then the new day's
  * events add at full `10^6` ppm each.
  *
  * Relationship to the batch op, stated precisely: per-event weights
  * `10^6 >> age` are identical (both hit zero past age 19, which is
  * why the batch cap at 20 needs no mirror here), but the monitor
  * floors the halving on the AGGREGATE mass once per day while the
  * batch op floors per event — the divergence is bounded by one unit
  * per feed-day and is the price of O(1) state; the differential
  * spec asserts the monitor ≡ its own direct fold exactly, and the
  * Scaladoc pin is this paragraph.
  *
  * Input contract: pre-bucketed day counts `(feed, day, n)` arriving
  * in per-feed day order across micro-batches (the watermarked
  * windowed-count shape); intra-batch disorder is absorbed by a
  * per-batch day sort. A row that still violates the contract AFTER
  * the sort (its day precedes the state's last day — a cross-batch
  * regression) is DROPPED, never folded: clamping it would move
  * `lastDay` backward and make the next in-order row re-halve mass
  * already added for newer days, silently corrupting state. Day
  * gaps ≥ 63 clear the mass outright (shifting past the long
  * width).
  *
  * Shape at scale: state is 2 longs per feed, bounded by the feed
  * domain; each micro-batch shuffles only its own day rows.
  */
object DecayMonitor {

  case class DayCount(feed: String, day: Long, n: Long)
  case class DecayState(w: Long, lastDay: Long)
  case class DecayOut(feed: String, day: Long, n: Long,
      decayed_weight_ppm: Long)

  def monitor(
      days: Dataset[DayCount]
  )(implicit spark: SparkSession): Dataset[DecayOut] = {
    import spark.implicits._
    days
      .groupByKey(_.feed)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (feed: String, rows: Iterator[DayCount],
         state: GroupState[DecayState]) =>
          var st = state.getOption.getOrElse(
            DecayState(0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.day).flatMap { r =>
            if (st.lastDay != Long.MinValue && r.day < st.lastDay) {
              // contract violation (cross-batch day regression):
              // drop rather than clamp — see the input-contract
              // scaladoc paragraph
              None
            } else {
              val gap =
                if (st.lastDay == Long.MinValue) 0L
                else r.day - st.lastDay
              val carried =
                if (gap >= 63L) 0L else st.w >> gap.toInt
              val w = carried + r.n * 1000000L
              st = DecayState(w, r.day)
              Some(DecayOut(feed, r.day, r.n, w))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
