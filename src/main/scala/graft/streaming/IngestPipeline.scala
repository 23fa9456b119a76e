package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ops.Text

/** Structured-Streaming deployment form of the incremental dedup
  * gates: a continuously-arriving document stream is admitted batch
  * by batch against an ACCUMULATING seen store — first the exact
  * gate ([[graft.ops.Text.incrementalDedupHashes]], 16-byte md5 per
  * seen text), then the near-dup gate
  * ([[graft.ops.Text.incrementalNearDupSigs]], stored MinHash
  * signatures) — and each batch's survivors extend the store before
  * the next trigger fires. Same per-batch-vs-state shape as the
  * reference's CDC dim flow (`app/OdsBaseDbApp.scala:139-166`:
  * per-batch driver hook, state read, route, state write), expressed
  * as `foreachBatch` like [[CdcPipeline.start]].
  *
  * The store holds ONLY the derived artifacts — hashes and
  * signatures, kilobytes per doc — never the text: at 100 TB the
  * seen corpus is two parquet/lakehouse tables that every batch
  * joins against and appends to. Appends happen inside the same
  * `foreachBatch`, so checkpoint recovery replays an uncommitted
  * batch against exactly the store it originally saw (at-least-once;
  * dedup admission is idempotent — a replayed admitted doc's hash is
  * now in the store, and re-admitting under the same doc_id is a
  * no-op for any downstream exact consumer).
  */
object IngestPipeline {

  /** The accumulating seen-state contract: read both artifact tables,
    * append a batch's admitted artifacts. Production backs this with
    * appendable parquet/lakehouse tables; tests use an in-memory
    * implementation. Reads return the state as of the LAST commit —
    * the gate never sees half-appended state.
    */
  trait SeenStore {
    /** `(text_hash)` rows — [[graft.ops.Text.seenHashes]] schema. */
    def hashes: DataFrame
    /** `(doc_id, sig, sh_hash)` rows —
      * [[graft.ops.Text.nearDupSignatures]] schema. */
    def sigs: DataFrame
    /** Commit one batch's admitted artifacts. CONTRACT: the frames'
      * lineages read this store's state, so an implementation MUST
      * snapshot both inputs before mutating anything — a mutation
      * mid-append invalidates the not-yet-written frame and it
      * re-gates against post-append state (see ParquetStore's
      * read-your-own-append note). */
    def append(admittedHashes: DataFrame, admittedSigs: DataFrame): Unit
  }

  val hashesSchema: StructType =
    StructType(Seq(StructField("text_hash", StringType, nullable = true)))
  val sigsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = true),
    StructField("sh_hash", ArrayType(LongType, containsNull = false),
      nullable = true)))

  /** In-memory store for tests/demos: state lives as collected rows
    * (the artifacts are small — that is the point of storing them
    * instead of text). Production replaces this with table appends.
    */
  final class MemoryStore(spark: SparkSession) extends SeenStore {
    private var h: Seq[org.apache.spark.sql.Row] = Seq.empty
    private var s: Seq[org.apache.spark.sql.Row] = Seq.empty
    def hashes: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(h, 1), hashesSchema)
    def sigs: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(s, 1), sigsSchema)
    def append(ah: DataFrame, as: DataFrame): Unit = {
      h = h ++ ah.collect()
      s = s ++ as.collect()
    }
  }

  /** Parquet-backed store — the production form: both artifact
    * tables are append-only parquet directories, so the seen state
    * survives restarts and is shared across writers the way any
    * lakehouse table is. Reads are lazy scans resolved when the
    * gate's joins execute (each `foreachBatch` re-plans, so a batch
    * sees every file committed before it); appends are atomic at
    * file granularity. At 100 TB these directories hold the ONLY
    * per-doc state the gate ever touches — hashes and signatures,
    * never text — and compaction/partitioning policy is plain table
    * maintenance.
    */
  final class ParquetStore(spark: SparkSession, dir: String)
      extends SeenStore {
    private val hPath = s"$dir/hashes"
    private val sPath = s"$dir/sigs"
    private def exists(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(path)
    }
    private def readOrEmpty(p: String, schema: StructType): DataFrame =
      if (exists(p)) spark.read.schema(schema).parquet(p)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def hashes: DataFrame = readOrEmpty(hPath, hashesSchema)
    def sigs: DataFrame = readOrEmpty(sPath, sigsSchema)
    def append(ah: DataFrame, as: DataFrame): Unit = {
      // Snapshot BOTH inputs (eager localCheckpoint truncates their
      // lineage) BEFORE touching either directory. The frames'
      // lineages read this store's files, and a parquet insert
      // refreshes every cached plan on the written path — without
      // the snapshot, appending the hashes would force the
      // signature frame to RECOMPUTE against post-append state, the
      // gate would see its own batch as "already seen", and the
      // signatures of every admitted doc would be silently dropped
      // (read-your-own-append; StreamingSpec's restart test catches
      // it). persist() does not protect — the refresh recaches it.
      val ahSnap = ah.localCheckpoint(eager = true)
      val asSnap = as.localCheckpoint(eager = true)
      try {
        ahSnap.write.mode("append").parquet(hPath)
        asSnap.write.mode("append").parquet(sPath)
      } finally Seq(ahSnap, asSnap).foreach(df =>
        org.apache.spark.sql.graftx.Bridge.leafRdd(df)
          .foreach(_.unpersist(blocking = false)))
    }
  }

  /** One micro-batch of the ingestion gate, factored out so batch
    * tests and the streaming query run the IDENTICAL logic (the
    * [[CdcPipeline.processBatch]] pattern). Admits the subset of
    * `batch` that is (a) not a byte-identical copy of anything seen
    * (nor of a lower-id doc in the same batch — the exact gate
    * dedups batch-internally too) and (b) not a near-duplicate
    * (shingle Jaccard >= `threshold`) of any seen doc. Emits the
    * admitted docs to `admitSink`, then commits their artifacts to
    * the store — data before state, so a crash between the two
    * replays rather than drops.
    *
    * Docs under 3 tokens carry no signature ([[Text.docShingles]]'
    * degenerate-doc guard) and face only the exact gate — a
    * sub-shingle-width doc has no meaningful Jaccard neighborhood.
    * Near-dup pairs WITHIN one batch are both admitted (the gate is
    * batch-vs-state, like the reference's); run
    * [[Text.minhashCandidates]] on the (small) batch first if
    * batch-internal near-dedup is wanted.
    */
  def processBatch(
      batch: DataFrame,
      store: SeenStore,
      admitSink: DataFrame => Unit,
      threshold: Double = 0.5
  ): Unit = {
    val exactSurvivors = Text
      .incrementalDedupHashes(batch, store.hashes).persist()
    try {
      val survivorSigs = Text.nearDupSignatures(exactSurvivors).persist()
      try {
        val nearDupIds = Text
          .incrementalNearDupSigs(survivorSigs, store.sigs, threshold)
          .select(col("doc_a").as("doc_id")).distinct()
        val admitted = exactSurvivors
          .join(nearDupIds, Seq("doc_id"), "left_anti").persist()
        try {
          admitSink(admitted)
          store.append(
            Text.seenHashes(admitted),
            // reuse the already-computed signatures, restricted to
            // the admitted ids — no re-shingling
            survivorSigs.join(admitted.select(col("doc_id")),
              Seq("doc_id"), "left_semi"))
        } finally admitted.unpersist(blocking = false)
      } finally survivorSigs.unpersist(blocking = false)
    } finally exactSurvivors.unpersist(blocking = false)
  }

  /** Streaming entry: document stream → gated admission against the
    * accumulating store. `source` is any streaming DataFrame with at
    * least (doc_id, text) — e.g. `LogPipeline.fromKafka(...)` parsed
    * to columns, or a file stream over landing parquet.
    */
  def start(
      source: DataFrame,
      store: SeenStore,
      admitSink: DataFrame => Unit,
      checkpoint: String,
      threshold: Double = 0.5,
      // the reference's 5 s micro-batch regime by default
      // (`OdsBaseLogApp.scala:25`); benches/tests pass
      // Trigger.AvailableNow or a zero-interval trigger so
      // processAllAvailable is not paced by wall-clock
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")
  ): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, store, admitSink, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
