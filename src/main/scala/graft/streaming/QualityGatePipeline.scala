package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Audit

/** Streaming deployment of the table-level data-quality gate
  * ([[graft.ops.Audit]]): every micro-batch runs the declarative
  * assertion suite, and the BATCH is the unit of admission — a batch
  * whose report is all-green flows to the admit sink, a failing batch
  * is quarantined whole with its report attached. This is the
  * snapshot-contract reading of quality: a half-admitted batch (rows
  * that individually look fine from a feed whose null rate just
  * tripled) is how silent upstream breakage gets INTO a training
  * corpus; batch-level gating holds the whole delivery at the door,
  * the same contract the batch [[graft.ops.Audit.assertionReport]]
  * enforces on snapshots. Per-row cleansing belongs to the upstream
  * demux (T3 error routing); this gate is the table-contract layer
  * above it.
  *
  * Same `foreachBatch` shape as [[IngestPipeline]] (reference anchor:
  * the per-batch driver hook of `app/OdsBaseDbApp.scala:139-166`);
  * the report is O(#checks) rows by construction, so the
  * driver-side pass/fail decision collects kilobytes regardless of
  * batch size, and the batch itself is persisted across the report
  * aggregation + the admit write so it is scanned once per consumer,
  * not re-derived from source.
  */
object QualityGatePipeline {

  /** One micro-batch of the gate, factored out so batch tests and
    * the streaming query run the identical logic. Runs `checks` over
    * `batch`; all-green → `admitSink(batch)`, else
    * `rejectSink(batch, report)` with the measured per-check rows.
    * `reportSink` (optional) observes every batch's report either
    * way — the monitoring-history hook.
    */
  def processBatch(
      batch: DataFrame,
      checks: Seq[Audit.Check],
      admitSink: DataFrame => Unit,
      rejectSink: (DataFrame, Seq[Row]) => Unit,
      reportSink: Seq[Row] => Unit = _ => ()
  ): Unit = {
    val cached = batch.persist()
    try {
      val report = Audit.assertionReport(cached, checks).collect().toSeq
      reportSink(report)
      if (report.forall(_.getAs[Boolean]("passed"))) admitSink(cached)
      else rejectSink(cached, report)
    } finally cached.unpersist(blocking = false)
  }

  /** Streaming entry: source stream → per-batch assertion gate. */
  def start(
      source: DataFrame,
      checks: Seq[Audit.Check],
      admitSink: DataFrame => Unit,
      rejectSink: (DataFrame, Seq[Row]) => Unit,
      checkpoint: String,
      reportSink: Seq[Row] => Unit = _ => (),
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, checks, admitSink, rejectSink, reportSink)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
