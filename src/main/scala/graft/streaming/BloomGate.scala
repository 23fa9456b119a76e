package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.Text

/** Structured-Streaming deployment form of the BLOOM pre-dedup gate
  * ([[graft.ops.Text.bloomDedupFpr]] is its batch replay/audit): a
  * document stream is admitted micro-batch by micro-batch against an
  * accumulating BIT store — the memory-bounded alternative to
  * [[IngestPipeline]]'s exact hash store. Where the exact gate's
  * state grows one hash per admitted doc forever, this gate's state
  * is capped at `mBits` positions no matter how many documents pass
  * — the trade the audit op prices (false positives = unique docs
  * wrongly dropped).
  *
  * Semantics contract (pinned by the differential spec): the
  * streamed admission decisions are IDENTICAL to the batch replay's
  * `first-setter < doc_id` rule under ANY micro-batch split of the
  * id-ordered stream. Two facts make that exact: (a) within a batch,
  * the minimum batch doc_id per position plays the first-setter
  * role; (b) a flagged doc's insertion is a BIT-LEVEL NO-OP (all its
  * positions are already set), so appending only admitted docs'
  * positions leaves the bit state identical to inserting every doc.
  *
  * State shape at 100 TB: one `(pos)` table bounded by `mBits` rows
  * — compaction is a `distinct()` rewrite; every batch joins against
  * it and appends its admitted positions (data before state, same
  * at-least-once replay posture as [[IngestPipeline.processBatch]]).
  */
object BloomGate {

  /** Accumulating bit-store contract: read the set positions,
    * append a batch's newly-set positions. */
  trait BitStore {
    /** `(pos)` rows — positions currently set. */
    def bits: DataFrame
    /** Commit one batch's admitted positions. Implementations MUST
      * snapshot the input before mutating (its lineage reads this
      * store — the [[IngestPipeline.ParquetStore]] lesson). */
    def append(newBits: DataFrame): Unit
  }

  val bitsSchema: StructType =
    StructType(Seq(StructField("pos", LongType, nullable = false)))

  /** In-memory store for tests/benches. */
  final class MemoryStore(spark: SparkSession) extends BitStore {
    private var b: Seq[org.apache.spark.sql.Row] = Seq.empty
    def bits: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(b, 1), bitsSchema)
    def append(nb: DataFrame): Unit = b = b ++ nb.collect()
  }

  /** Parquet-backed store — the production form; the whole table is
    * ≤ mBits skinny rows, so even the un-compacted append log is
    * tiny relative to the corpus it gates. */
  final class ParquetStore(spark: SparkSession, dir: String)
      extends BitStore {
    private def exists: Boolean = {
      val path = new org.apache.hadoop.fs.Path(dir)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(path)
    }
    def bits: DataFrame =
      if (exists) spark.read.schema(bitsSchema).parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        bitsSchema)
    def append(nb: DataFrame): Unit = {
      val snap = nb.localCheckpoint(eager = true)
      try snap.write.mode("append").parquet(dir)
      finally org.apache.spark.sql.graftx.Bridge.leafRdd(snap)
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** One micro-batch: flag docs whose k positions are ALL set —
    * either in the store or by a smaller-id doc of the same batch —
    * admit the rest, then append the admitted positions. */
  def processBatch(
      batch: DataFrame,
      store: BitStore,
      admitSink: DataFrame => Unit,
      mBits: Int = 4096,
      kHashes: Int = 3
  ): Unit = {
    val p = Text.bloomPositions(batch, mBits, kHashes).persist()
    try {
      val batchFirst = p.groupBy(col("pos"))
        .agg(min(col("doc_id")).as("batch_first"))
      val seen = store.bits.select(col("pos")).distinct()
        .withColumn("in_store", lit(1L))
      val admittedIds = p
        .join(batchFirst, "pos")
        .join(seen, Seq("pos"), "left")
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("in_store").isNotNull
              || col("batch_first") < col("doc_id"), 1L)
            .otherwise(0L)).as("hits"),
          count(lit(1)).as("k_rows"))
        .filter(col("hits") < col("k_rows"))
        .select(col("doc_id"))
      val admitted = batch
        .join(admittedIds, Seq("doc_id"), "left_semi").persist()
      try {
        admitSink(admitted)
        store.append(Text.bloomPositions(admitted, mBits, kHashes)
          .select(col("pos")).distinct())
      } finally admitted.unpersist(blocking = false)
    } finally p.unpersist(blocking = false)
  }

  /** Streaming entry: document stream → Bloom-gated admission
    * against the accumulating bit store. */
  def start(
      source: DataFrame,
      store: BitStore,
      admitSink: DataFrame => Unit,
      checkpoint: String,
      mBits: Int = 4096,
      kHashes: Int = 3,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, store, admitSink, mBits, kHashes)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
