package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export surface: partitioned and bucketed parquet
  * writers — the batch sink side of the pipeline (the reference's
  * sinks are Kafka/Redis/HBase; a Spark-native engine's durable sink
  * is the lakehouse layout these writers produce).
  *
  * Layout choices are the scale story:
  *  - `partitionBy` low-cardinality curation keys (lang, stratum) so
  *    downstream jobs prune whole directories at the source —
  *    partition pruning is the parquet analogue of the reference's
  *    per-topic Kafka routing;
  *  - `bucketBy` the join key so repeated consumers join co-located
  *    without a shuffle (see BucketedJoinSpec: zero join-side
  *    exchanges);
  *  - `maxRecordsPerFile` bounds file sizes so a 100 TB export can't
  *    produce unsplittable monster files.
  */
object Export {

  /** Write docs partitioned by language (directory per lang). */
  def writePartitioned(
      docs: DataFrame,
      path: String,
      partitionCols: Seq[String] = Seq("lang"),
      maxRecordsPerFile: Long = 1000000L
  ): Unit =
    docs.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Export integrity manifest — the artifact that travels WITH a
    * training-data delivery so the consumer can verify it without
    * trusting the pipe: per partition value, the row count, payload
    * byte volume, and an order-independent content checksum
    * (commutative sum of a per-row 60-bit MD5 integer, reduced mod
    * 1e9+7 per row so the BIGINT sum is exact in both engines —
    * documented bound n < 9·10⁹ rows/partition; the md5-integer
    * convention is [[Multimodal.md5_60]]'s, bit-identical across
    * engines). A re-read export whose manifest reproduces is intact
    * row-for-row regardless of file order — which is exactly what a
    * parallel 100 TB copy scrambles.
    *
    * One scan + one groupBy(partition) with map-side combine.
    */
  def manifest(
      df: DataFrame,
      partition: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column
  ): DataFrame =
    df.select(partition.as("part"), id.as("__id"),
        payload.as("__pay"))
      .select(col("part"), length(col("__pay")).as("len"),
        expr("conv(substr(md5(concat(__id, ':', __pay)), 1, 15), " +
          "16, 10)").cast("long").as("h"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("len").cast("long")).as("payload_bytes"),
        sum(col("h") % 1000000007L).as("checksum"))
      .orderBy(col("part"))

  /** Byte-budgeted shard manifest — the WebDataset/tar-shard
    * assignment a training-data export runs last: within each
    * `partition` (source/lang — shards don't cross it, which is also
    * what keeps the running sum a PARTITIONED window, never global),
    * docs pack in id order into shards of ~`budgetBytes`; a doc is
    * assigned by the shard of its END byte (`(cum − 1) div budget`),
    * so shards overflow by at most one document and never split one
    * — the contract a sequential tar writer needs. Output: one
    * manifest row per shard with exact byte/doc counts and the
    * id range a reader seeks by.
    */
  def shardManifest(
      df: DataFrame,
      partition: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column,
      budgetBytes: Long = 1L << 20
  ): DataFrame = {
    require(budgetBytes >= 1, s"budget must be >= 1, got $budgetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part")).orderBy(col("__id"))
    df.select(partition.as("part"), id.as("__id"),
        octet_length(payload).cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("shard_id",
        expr(s"GREATEST(cum - 1, 0) div $budgetBytes"))
      .groupBy(col("part"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("shard_bytes"),
        min(col("__id")).as("first_id"),
        max(col("__id")).as("last_id"))
      .orderBy(col("part"), col("shard_id"))
  }

  /** Read a partitioned export back; `filterLang` demonstrates that
    * the partition predicate prunes directories (PartitionFilters in
    * the scan, zero rows read from other langs).
    */
  def readPartitioned(
      s: SparkSession,
      path: String,
      filterLang: Option[String] = None
  ): DataFrame = {
    val df = s.read.parquet(path)
    filterLang.fold(df)(l => df.filter(col("lang") === l))
  }
}
