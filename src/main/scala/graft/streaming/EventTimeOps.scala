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
}
