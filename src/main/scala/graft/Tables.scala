package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (/root/TESTDATA.md).
  *
  * All engine operators consume these via plain `spark.read.parquet` so
  * Catalyst gets full pushdown: column pruning and predicate pushdown
  * reach the parquet scan (verify via `.explain("formatted")` →
  * `PushedFilters` / `ReadSchema`). At 100 TB the same call pattern
  * works unchanged against a partitioned table root.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects by default —
    * read as raw nanos via `nanosAsLong` and truncate to micros, the
    * same truncation DuckDB applies) and TIMESTAMP_MICROS with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ).
    * Normalize both to session-TZ TimestampType: every session here
    * pins UTC, so the NTZ cast is value-identity and downstream
    * operators see identical microsecond timestamps either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    apply(s, d, "embeddings")
}
