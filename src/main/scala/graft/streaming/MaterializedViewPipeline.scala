package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.Cdc

/** Streaming deployment of [[graft.ops.Cdc.maintainSumCount]]: a
  * continuously-maintained SUM/COUNT materialized view over a CDC
  * change stream. Every micro-batch is a delta; the stored view is
  * read, merged (delta-sized agg + view-keyed join — the fact is
  * never rescanned, WHY this exists at 100 TB), and replaced. The
  * [[IngestPipeline]] stored-artifact discipline applies: the view
  * IS the state, it lives in a store the next batch reads back, and
  * batch tests drive the identical `processBatch`.
  *
  * View surface: `(key string, n_rows long, sum_v double)` — the
  * maintainSumCount contract. Exactness across batches holds because
  * each merge is exact decimal; the double materialization per
  * version is the only rounding, re-absorbed on the next merge via
  * the decimal cast (sum_v values representable in decimal(18,4)
  * round-trip double→decimal losslessly — the dsum convention).
  */
object MaterializedViewPipeline {

  val viewSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("n_rows", LongType),
    StructField("sum_v", DoubleType)))

  /** Pluggable view store: current snapshot + atomic replace. */
  trait ViewStore {
    def view: DataFrame
    def replace(updated: DataFrame): Unit
  }

  /** Driver-memory store (the view is key-domain-sized by
    * construction — an aggregate, not a corpus — so rows-in-driver
    * is the honest cost statement, same as the bench's model-sized
    * collects; swap [[ParquetViewStore]] in when the key domain is
    * itself large).
    */
  final class MemoryViewStore(spark: SparkSession) extends ViewStore {
    private var rows: Seq[Row] = Seq.empty
    def view: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), viewSchema)
    def replace(updated: DataFrame): Unit =
      rows = updated.collect().toSeq
  }

  /** Distributed store: versioned parquet snapshots with a swap —
    * the updated view is snapshotted (eager localCheckpoint, lineage
    * truncated) BEFORE its predecessor version is dropped, so the
    * merge never reads a directory it is overwriting (the
    * [[IngestPipeline.ParquetStore]] read-your-own-write discipline,
    * here as versioned swap instead of append).
    */
  final class ParquetViewStore(spark: SparkSession, dir: String)
      extends ViewStore {
    private def fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def versions: Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted
    }
    def view: DataFrame = versions.lastOption match {
      case Some(v) =>
        spark.read.schema(viewSchema).parquet(s"$dir/v$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], viewSchema)
    }
    def replace(updated: DataFrame): Unit = {
      val prev = versions
      val next = prev.lastOption.getOrElse(0L) + 1L
      val snap = updated.localCheckpoint(eager = true)
      try snap.write.mode("overwrite").parquet(s"$dir/v$next")
      finally org.apache.spark.sql.graftx.Bridge.leafRdd(snap)
        .foreach(_.unpersist(blocking = false))
      prev.foreach(v => fs.delete(
        new org.apache.hadoop.fs.Path(s"$dir/v$v"), true))
    }
  }

  /** One micro-batch: merge the delta into the stored view. Factored
    * out so batch tests and the stream run identical logic.
    */
  def processBatch(delta: DataFrame, store: ViewStore): Unit =
    store.replace(Cdc.maintainSumCount(store.view, delta))

  /** Streaming entry: CDC delta stream → continuously-maintained
    * view. `source` carries `(key, op, v, old_v)`.
    */
  def start(
      source: DataFrame,
      store: ViewStore,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, store)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
