package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.Vector

/** Structured-Streaming deployment form of the incremental SEMANTIC
  * dedup gate — the embedding-side sibling of [[IngestPipeline]]: a
  * continuously-arriving embedding stream is admitted batch by batch
  * against an accumulating seen store of
  * [[graft.ops.Vector.semanticSignaturesAssigned]] artifacts
  * (`(vec_id, list_id, unit)` — coarse-list assignment + unit vector,
  * never the raw corpus), and each batch's survivors extend the
  * store before the next trigger fires. Same per-batch-vs-state
  * shape as the text gate and the reference's CDC dim flow
  * (`app/OdsBaseDbApp.scala:139-166`).
  *
  * The comparison discipline is SemDeDup's (within coarse list
  * only), so per-batch work is Σ over batch vectors of their lists'
  * seen occupancy — never batch × corpus — and the batch side is
  * broadcast, so the seen table is never shuffled. Batch-internal
  * near-dups are both admitted (batch-vs-state, like the text
  * gate); run [[graft.ops.Vector.semanticNearDupPairsAssigned]] on
  * the (small) batch first if batch-internal dedup is wanted.
  */
object SemanticIngestPipeline {

  /** The accumulating seen-state contract (single artifact table).
    * Reads return the state as of the LAST commit — the gate never
    * sees half-appended state.
    */
  trait SeenStore {
    /** `(vec_id, list_id, unit)` rows —
      * [[graft.ops.Vector.semanticSignaturesAssigned]] schema. */
    def sigs: DataFrame
    /** Commit one batch's admitted artifacts. CONTRACT: the frame's
      * lineage reads this store's state, so an implementation MUST
      * snapshot the input before mutating anything (see
      * [[IngestPipeline.ParquetStore]]'s read-your-own-append
      * note). */
    def append(admittedSigs: DataFrame): Unit
  }

  val sigsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("list_id", IntegerType, nullable = true),
    StructField("unit", ArrayType(DoubleType, containsNull = true),
      nullable = true)))

  /** In-memory store for tests/demos (artifacts are small — that is
    * the point). Production replaces this with table appends.
    */
  final class MemoryStore(spark: SparkSession) extends SeenStore {
    private var s: Seq[org.apache.spark.sql.Row] = Seq.empty
    def sigs: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(s, 1), sigsSchema)
    def append(as: DataFrame): Unit = s = s ++ as.collect()
  }

  /** Parquet-backed store — the production form: append-only parquet
    * directory, PARTITIONED BY `list_id`, survives restarts. The
    * layout is the point at 100 TB: a batch occupies at most
    * #coarse-lists partitions, and [[processBatch]] restricts the
    * seen-side scan to the batch's lists, so each probe reads only
    * the touched partitions (PartitionFilters at the scan — spec
    * asserted) instead of the full accumulated corpus.
    */
  final class ParquetStore(spark: SparkSession, dir: String)
      extends SeenStore {
    private def exists: Boolean = {
      val path = new org.apache.hadoop.fs.Path(dir)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(path)
    }
    def sigs: DataFrame =
      if (exists) spark.read.schema(sigsSchema).parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        sigsSchema)
    def append(as: DataFrame): Unit = {
      // FORMAT BREAK (r8 → r9): the store is now partitioned by
      // list_id. A directory written by the old unpartitioned code
      // has data files at the root; appending list_id=N/ dirs next to
      // them makes Spark partition discovery fail with a confusing
      // "conflicting directory structures" error much later — detect
      // it here and fail with a migration message instead.
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path) &&
          fs.listStatus(path).exists(st =>
            st.isFile && st.getPath.getName.endsWith(".parquet")))
        throw new IllegalStateException(
          s"SemanticIngestPipeline.ParquetStore at $dir holds the " +
            "pre-r9 unpartitioned layout (root-level .parquet files); " +
            "appending the list_id-partitioned layout next to it would " +
            "break partition discovery. Migrate once: read the old " +
            "store and rewrite it with partitionBy(\"list_id\") to a " +
            "fresh directory.")
      // snapshot BEFORE writing: the frame's lineage reads this
      // directory, and a parquet insert refreshes every cached plan
      // on the written path (the same read-your-own-append hazard
      // IngestPipeline.ParquetStore documents)
      val snap = as.localCheckpoint(eager = true)
      try snap.write.mode("append").partitionBy("list_id").parquet(dir)
      finally org.apache.spark.sql.graftx.Bridge.leafRdd(snap)
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** One micro-batch of the semantic gate, factored out so batch
    * tests and the streaming query run the IDENTICAL logic. `assign`
    * attaches the coarse `list_id` to a batch — typically
    * `Vector.assignLists(_, model)` with the offline-fitted
    * quantizer, or a metadata-column assignment. Admits the subset
    * of `batch` with no seen semantic duplicate (cosine >=
    * `threshold` within its coarse list), emits it to `admitSink`,
    * then commits the admitted artifacts — data before state, so a
    * crash between the two replays rather than drops.
    */
  def processBatch(
      batch: DataFrame,
      store: SeenStore,
      assign: DataFrame => DataFrame,
      admitSink: DataFrame => Unit,
      threshold: Double
  ): Unit = {
    val sigs = Vector.semanticSignaturesAssigned(assign(batch)).persist()
    try {
      // Restrict the seen side to the lists this batch touches: the
      // dup join is within-list anyway (pure pruning, no semantic
      // change), and against a list_id-partitioned store the isin
      // becomes a static partition filter — the probe reads ≤
      // |batch lists| partitions, never the accumulated corpus. The
      // collect is batch-sized by construction (≤ #coarse lists).
      val batchLists = sigs.select(col("list_id")).distinct().collect()
      val nonNull = batchLists.filter(!_.isNullAt(0)).map(_.getInt(0))
      val inLists = col("list_id").isin(nonNull.map(Int.box): _*)
      val seen = store.sigs.filter(
        if (batchLists.exists(_.isNullAt(0)))
          inLists || col("list_id").isNull
        else inLists)
      val dupIds = Vector
        .incrementalSemanticDupsSigs(sigs, seen, threshold)
        .select(col("vec_a").as("vec_id")).distinct()
      val admitted = batch
        .join(dupIds, Seq("vec_id"), "left_anti").persist()
      try {
        admitSink(admitted)
        store.append(sigs.join(admitted.select(col("vec_id")),
          Seq("vec_id"), "left_semi"))
      } finally admitted.unpersist(blocking = false)
    } finally sigs.unpersist(blocking = false)
  }

  /** Streaming entry: embedding stream → gated admission against the
    * accumulating store. `source` is any streaming DataFrame with at
    * least (vec_id, embedding).
    */
  def start(
      source: DataFrame,
      store: SeenStore,
      assign: DataFrame => DataFrame,
      admitSink: DataFrame => Unit,
      checkpoint: String,
      threshold: Double,
      // 5 s micro-batches by default (the reference regime); benches
      // and tests pass a zero-interval trigger so
      // processAllAvailable is not paced by wall-clock
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, store, assign, admitSink, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
