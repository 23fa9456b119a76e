package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key admission rate limiting — the ingestion-protection gate in
  * front of every shared pipeline (a runaway producer, a crawler
  * retry-storm, one tenant flooding a multi-tenant feed): admit at
  * most `capacity` events per key per ALIGNED event-time window of
  * `windowMs`, mark the excess rejected. Decisions are emitted for
  * every row (admission gates audit what they drop — the
  * IngestPipeline discipline), so the output is a decision log the
  * admit/reject sinks split on `admitted`.
  *
  * Streaming form: `flatMapGroupsWithState` (the [[Sessionize]]
  * shape) with one tiny state cell per key — current window index +
  * used count — purged by event-time timeout one full window after
  * the key goes idle, which is what bounds state under millions of
  * keys. Windows are ts-div-aligned so the decision for a row
  * depends only on (key, window, arrival order), making streaming
  * and batch replays agree row for row.
  *
  * Policy for late rows (event time in a window OLDER than the
  * key's current window, i.e. beyond the reorder the watermark
  * allows): rejected, not re-admitted — a rate limiter is an
  * admission gate, not a reorder buffer; re-opening past windows
  * would let a replay attack around the limit. The batch twin
  * ([[rateLimitBatch]]) sees no lateness by construction, so the
  * equivalence spec feeds in-order keys.
  */
object RateLimit {

  case class Event(user_id: Long, ts: Long, value: Double)
  case class EventW(
      user_id: Long, ts: Long, value: Double, ets: java.sql.Timestamp)
  case class BucketState(window: Long, used: Int)
  case class Decision(
      user_id: Long, ts: Long, window: Long, admitted: Boolean,
      used: Int)

  def rateLimit(
      events: Dataset[Event],
      capacity: Int,
      windowMs: Long,
      watermarkDelay: String = "10 seconds"
  )(implicit spark: SparkSession): Dataset[Decision] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    import spark.implicits._
    events
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", watermarkDelay)
      .as[EventW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, Decision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EventW],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts, e.value))
            var cur = state.getOption.getOrElse(BucketState(-1L, 0))
            val out = Seq.newBuilder[Decision]
            sorted.foreach { e =>
              val w = e.ts / windowMs
              if (w > cur.window) cur = BucketState(w, 0)
              val admit = w == cur.window && cur.used < capacity
              if (admit) cur = cur.copy(used = cur.used + 1)
              out += Decision(uid, e.ts, w, admit,
                if (w == cur.window) cur.used else capacity)
            }
            state.update(cur)
            // purge idle keys one full window past the watermark
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1,
                (cur.window + 2) * windowMs))
            out.result().iterator
          }
      }
  }

  /** Batch twin: identical decisions on an in-order replay —
    * row_number over (key, aligned window) ordered by (ts, value),
    * admitted while ≤ capacity. One shuffle on the key; the window
    * sort is per (key, window), never global.
    */
  def rateLimitBatch(
      events: DataFrame, capacity: Int, windowMs: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("window"))
      .orderBy(col("ts"), col("value"))
    events
      .withColumn("window", expr(s"ts div $windowMs"))
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("ts"), col("window"),
        (col("rn") <= capacity).as("admitted"),
        least(col("rn"), lit(capacity)).as("used"))
  }
}
