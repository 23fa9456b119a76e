package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Demux

/** Structured-Streaming wiring for the log demux (reference
  * `app/OdsBaseLogApp.scala`, SURVEY §3.1).
  *
  * The reference's DStream topology (5 s micro-batches, manual Redis
  * offsets, per-partition producer flush) maps to:
  *  - `readStream.format("kafka")` + `Trigger.ProcessingTime("5
  *    seconds")` (S1/S2; micro-batch cadence),
  *  - checkpointLocation (S3/K3; offset resume + at-least-once commit
  *    ordering — data sinks flush before the commit log advances),
  *  - the built-in Kafka sink with a computed `topic` column (K1 —
  *    one sink writes all 5 DWD topics; producer pooling/batching is
  *    the sink's job, reproducing the reference's per-partition flush
  *    amortization),
  *  - one `foreachBatch` with `persist()` to demux 5 ways in a single
  *    source pass (E1/E2 — mirrors the reference's single traversal).
  *
  * The transform core is the SAME `Demux` functions the batch/oracle
  * path uses — streaming here is wiring, not logic.
  */
object LogPipeline {

  val ErrorTopic   = "DWD_ERROR_LOG"
  val PageTopic    = "DWD_PAGE_LOG"
  val DisplayTopic = "DWD_PAGE_DISPLAY"
  val ActionTopic  = "DWD_PAGE_ACTION"
  val StartTopic   = "DWD_START_LOG"

  /** Kafka source (reference S1/S2: subscribe, group id, latest).
    * Offset resume is the checkpoint's job — no Redis equivalent
    * needed (SURVEY §2.1 S3).
    */
  def fromKafka(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      startingOffsets: String = "latest"
  ): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** The 5-way demux as (topic → JSON value) rows in ONE DataFrame —
    * the Kafka sink routes on the `topic` column, so a single
    * streaming query serves all branches (no 5× source re-read, one
    * checkpoint, atomic-enough commit ordering).
    *
    * Uses the literally-one-pass form (`Demux.topicValues`: one parse
    * + one Generate per record); the union-of-branches twin below
    * re-parses per branch leg in a streaming plan (no persist there)
    * and exists as the differential-test reference.
    */
  def demuxToTopicValue(raw: DataFrame): DataFrame =
    Demux.topicValues(Demux.parse(raw),
      ErrorTopic, PageTopic, DisplayTopic, ActionTopic, StartTopic)

  /** Union-of-branches form: same (topic, value) multiset as
    * [[demuxToTopicValue]], built from the five independent branch
    * projections + per-branch serialization.
    */
  def demuxToTopicValueUnion(raw: DataFrame): DataFrame = {
    val parsed = Demux.parse(raw)
    def tag(df: DataFrame, topic: String): DataFrame =
      Demux.toJsonValue(df).select(lit(topic).as("topic"), col("value"))
    tag(Demux.errors(parsed), ErrorTopic)
      .unionByName(tag(Demux.pages(parsed), PageTopic))
      .unionByName(tag(Demux.displays(parsed), DisplayTopic))
      .unionByName(tag(Demux.actions(parsed), ActionTopic))
      .unionByName(tag(Demux.starts(parsed), StartTopic))
  }

  /** T1 equivalent (`transform` offset/metric capture without a second
    * stream traversal): `observe` attaches metrics to the single pass.
    * Batch callers read them from the returned Observation; streaming
    * callers get them per micro-batch via
    * `StreamingQueryProgress.observedMetrics` (same plan node).
    */
  def demuxWithMetrics(
      raw: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("demux_in")
    val observed = raw.observe(obs, count(lit(1)).as("n_in"))
    (demuxToTopicValue(observed), obs)
  }

  /** End-to-end: Kafka ODS topic → 5 DWD topics, 5 s micro-batches,
    * checkpointed. Runs the one-pass demux (one parse + one Generate
    * per record); the single query keeps offset commit ordering
    * identical to the reference (flush before offset save,
    * `OdsBaseLogApp.scala:194,205`).
    */
  def start(
      spark: SparkSession,
      bootstrap: String,
      sourceTopic: String,
      checkpoint: String
  ): StreamingQuery =
    demuxToTopicValue(fromKafka(spark, bootstrap, sourceTopic))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .start()
}
