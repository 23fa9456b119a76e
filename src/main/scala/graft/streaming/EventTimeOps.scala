package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time operators the reference lacks entirely (SURVEY §2.6:
  * no watermarks, no windows, no late-data policy — event time is
  * carried as data only). The rebuild ships them as first-class:
  * tumbling/sliding/session windows + watermark + streaming dedup.
  *
  * Each works identically on a batch DataFrame (watermark is a no-op
  * there), which is how the batch oracle exercises the same plans.
  */
object EventTimeOps {

  /** Tumbling (or sliding, when `slide` differs) event-time window
    * aggregation with late-data bound.
    */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      slide: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user (gap-based). */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming dedup by key within the watermark horizon — state is
    * bounded (keys expire past the watermark), the 100 TB-safe form
    * of exact dedup on a stream.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static dim enrichment — the reference R2's broadcast
    * pattern (`OdsBaseDbApp.scala:89-99`) in declarative streaming
    * form: the static side is (re)read and broadcast per micro-batch,
    * the stream side never shuffles.
    */
  def enrichWithDim(
      stream: DataFrame,
      dim: DataFrame,
      key: String
  ): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream event-time interval join: attribute each action
    * (e.g. click) to the view by the same user that happened at most
    * `maxDelay` before it. BOTH sides carry a watermark and the join
    * condition bounds event-time distance — that pair of constraints
    * is what lets the state store evict rows once the watermark
    * passes `ts + maxDelay`, keeping state size proportional to the
    * delay horizon instead of the stream's history. Without the time
    * bound a stream-stream join must buffer forever — the 100 TB
    * failure mode this operator exists to avoid.
    *
    * Works identically on batch frames (watermarks are no-ops there),
    * which is how the batch twin `q_funnel`-style oracles exercise
    * the same join shape.
    */
  def intervalJoin(
      views: DataFrame,
      actions: DataFrame,
      maxDelay: String = "10 minutes",
      watermark: String = "10 minutes"
  ): DataFrame = {
    val v = views
      .withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val a = actions
      .withWatermark("ts", watermark)
      .select(col("user_id").as("a_user"), col("event_id").as("action_id"),
        col("ts").as("action_ts"))
    v.join(a,
      col("v_user") === col("a_user") &&
        col("action_ts") >= col("view_ts") &&
        col("action_ts") <= col("view_ts") + expr(s"INTERVAL $maxDelay"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("action_id"), col("view_ts"), col("action_ts"))
  }
}
