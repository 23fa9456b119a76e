package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are the concatenation of the per-module
  * registries; each module owns its names and keeps Spark-side aliases
  * identical to the oracle-SQL aliases (driver compare sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Multi-way star join + exact-decimal agg (SURVEY §2.6).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    ops.Relational.revenueByNation(
      Tables.customer(spark, d),
      Tables.orders(spark, d),
      Tables.lineitem(spark, d),
      Tables.nation(spark, d)
    )
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalQueries.queries ++
      ops.AffinityQueries.queries ++
      ops.DemuxQueries.queries ++
      ops.CdcQueries.queries ++
      ops.TextQueries.queries ++
      ops.VectorQueries.queries ++
      ops.MultimodalQueries.queries ++
      ops.LayoutQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    ops.RelationalQueries.oracle ++
      ops.AffinityQueries.oracle ++
      ops.DemuxQueries.oracle ++
      ops.CdcQueries.oracle ++
      ops.TextQueries.oracle ++
      ops.VectorQueries.oracle ++
      ops.MultimodalQueries.oracle ++
      ops.LayoutQueries.oracle
}
