package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Effectively-once parquet sink for foreachBatch — the replay
  * discipline that turns Structured Streaming's at-least-once batch
  * redelivery into exactly-once OUTPUT: every micro-batch lands in a
  * `batch_id=<n>` partition via dynamic-partition OVERWRITE, so a
  * replayed batch (failure between sink write and checkpoint commit —
  * the redelivery window) REPLACES its own partition instead of
  * appending duplicates. This is the idempotent-sink half of the
  * exactly-once contract; the source half (checkpointed offsets,
  * S3/K3) is LogPipeline's. The batch id is Spark's: deterministic
  * per checkpoint, stable across restarts — which is precisely why
  * keying the output by it is safe.
  *
  * Consumers read the directory as-is; the `batch_id` partition
  * column doubles as output lineage (which delivery produced each
  * row).
  */
object IdempotentSink {

  /** One batch write — idempotent under replay of the same batchId. */
  def write(batch: DataFrame, batchId: Long, dir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  def start(
      source: DataFrame,
      dir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        write(batch, id, dir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
