package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Cdc.hotKeys` — the write-bottleneck read run
  * CONTINUOUSLY: a keyed sink (LWW dim upsert, MERGE target)
  * serializes per key, so the keys absorbing percents of the CDC
  * feed right NOW are the ones about to stall it, and a batch
  * profile over yesterday's feed names yesterday's bottleneck. State
  * per key is the [[DecayMonitor]] recurrence — one long of decayed
  * change mass (ppm) plus the day it was valid for; on a day
  * rollover the mass halves once per elapsed day (chained integer
  * halvings ≡ one `div 2^gap`, the DecayMonitor identity), then the
  * day's changes add at `10^6` ppm each. A key's emitted mass is
  * directly comparable across keys — the live ranking any topN
  * consumer (alert, throttle, salting trigger) reads off.
  *
  * Input contract: RAW change rows `(key, day)` — the shape straight
  * off a parsed CDC envelope, no pre-bucketing required (the monitor
  * buckets each micro-batch by day itself); per-key day order across
  * micro-batches, intra-batch disorder absorbed by the per-batch day
  * sort. A row whose day precedes the state's last day (cross-batch
  * regression) is DROPPED, never folded — same contract and
  * rationale as [[DecayMonitor]] (a clamped fold would re-halve
  * newer mass). Day gaps ≥ 63 clear the mass outright.
  *
  * Shape at scale: state is 2 longs per KEY (the key domain, not the
  * stream — same bound as the keyed sink this protects); each
  * micro-batch shuffles only its own rows to their key's state
  * partition, and the per-batch fold is one groupBy-day inside the
  * iterator, no second shuffle.
  */
object HotKeyMonitor {

  case class Change(key: String, day: Long)
  case class KeyState(w: Long, lastDay: Long)
  case class HotOut(key: String, day: Long, n: Long,
      decayed_changes_ppm: Long)

  def monitor(
      changes: Dataset[Change]
  )(implicit spark: SparkSession): Dataset[HotOut] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, HotOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Change],
         state: GroupState[KeyState]) =>
          var st = state.getOption.getOrElse(
            KeyState(0L, Long.MinValue))
          val out = rows.toSeq.groupBy(_.day).toSeq.sortBy(_._1)
            .flatMap { case (day, rs) =>
              if (st.lastDay != Long.MinValue && day < st.lastDay) {
                None // contract violation: drop, never clamp
              } else {
                val gap =
                  if (st.lastDay == Long.MinValue) 0L
                  else day - st.lastDay
                val carried =
                  if (gap >= 63L) 0L else st.w >> gap.toInt
                val w = carried + rs.size * 1000000L
                st = KeyState(w, day)
                Some(HotOut(key, day, rs.size.toLong, w))
              }
            }
          state.update(st)
          out.iterator
      }
  }
}
