package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState — the rebuild's
  * example of arbitrary stateful processing (SURVEY §2.6 streaming
  * row; the reference has no stateful ops at all).
  *
  * Emits one row per closed user session (gap-based). Sessions close
  * two ways: a same-key event beyond the gap (inline), or the
  * event-time watermark passing last+gap for an idle key (timeout) —
  * the timeout path also REMOVES the state, which is what bounds
  * state size under millions of keys. Event-time (not
  * processing-time) timers keep the operator deterministic and
  * testable.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Long, value: Double)
  case class EventW(
      user_id: Long, ts: Long, value: Double, ets: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(
      user_id: Long, start: Long, end: Long, n_events: Int,
      sum_value: Double)

  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 seconds"
  )(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", watermarkDelay)
      .as[EventW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EventW],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.last <= gapMs =>
                  cur = Some(s.copy(last = e.ts, n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timers must be strictly beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1, s.last + gapMs))
            }
            closed.result().iterator
          }
      }
  }
}
