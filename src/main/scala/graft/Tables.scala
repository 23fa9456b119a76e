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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as raw nanos (`nanosAsLong`) and truncate to
    * microseconds — the same truncation DuckDB applies — so both sides
    * of the oracle see identical microsecond timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    apply(s, d, "embeddings")
}
