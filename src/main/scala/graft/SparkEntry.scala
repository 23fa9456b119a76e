package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Sweep-integrity canaries (SURVEY §2.8). The round-10 driver
    * artifact lost its alphabetical TAIL — 22 contiguous `err` rows
    * (DuckDB "Failed to allocate block" on 500-row inputs, cured by
    * the low-allocation preamble in r11) plus 4 hash mismatches that
    * r11 root-caused to a real repo bug (un-CAST SUM -> HUGEINT ->
    * fetchdf float64; fixed r12). The canaries adjudicate which mode
    * a red row is: green canaries + persistent hash-fail = real
    * engine/oracle divergence; red canary = sweep self-corruption.
    * These two
    * constant queries bracket the sorted registry (`q_aa…` first,
    * `q_zz…` last); their values never change, so a red canary row
    * PROVES the sweep self-corrupted rather than the engine being
    * wrong — and a green `q_zz_canary` additionally witnesses that
    * the tail of the sweep executed with an intact allocator.
    */
  private def canary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "alpha", 0.5), (2L, "beta", 2.25), (3L, "gamma", -4.0))
      .toDF("k", "tag", "v")
      .select(col("k"), col("tag"), col("v"))
      .orderBy(col("k"))
  }

  private val canarySql =
    "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha', 0.5), " +
      "(CAST(2 AS BIGINT), 'beta', 2.25), " +
      "(CAST(3 AS BIGINT), 'gamma', -4.0)) t(k, tag, v) ORDER BY k"

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalQueries.queries ++
      ops.AffinityQueries.queries ++
      ops.DemuxQueries.queries ++
      ops.CdcQueries.queries ++
      ops.TextQueries.queries ++
      ops.VectorQueries.queries ++
      ops.MultimodalQueries.queries ++
      ops.LayoutQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        "q_aa_canary" -> ((s, _) => canary(s)),
        "q_zz_canary" -> ((s, _) => canary(s)))

  /** The alphabetical tail of the r10 sweep OOM'd inside the driver's
    * DuckDB (allocator exhaustion after ~200 connection cycles — each
    * failure a sub-MB block with >100 GB free). These queries get a
    * low-allocation preamble: `SET threads=2` cuts per-operator buffer
    * fan-out ~16× and `SET memory_limit='2GB'` keeps the buffer pool
    * eviction-happy — at sf0.01 (500-row embeddings) every one of
    * these completes in well under that. Verified locally that BOTH
    * duckdb-python call shapes (`execute(sql).fetchdf()` and
    * `sql(sql).df()`, duckdb 1.0.0 = this container's build) run a
    * multi-statement string and return the LAST statement's result.
    * Applied ONLY to the queries whose driver rows were already red —
    * asymmetric: if the driver's runner rejects multi-statement SQL
    * these rows are no worse off, and `q_zz_canary` (also preambled)
    * tells us which way it went.
    */
  private val lowAllocPreamble =
    "SET threads=2; SET memory_limit='2GB'; "

  private val preambled: Set[String] = Set(
    "q_vec_cluster_reps", "q_vec_coreset_sample", "q_vec_cosine_topk",
    "q_vec_density_prune", "q_vec_doc_pool", "q_vec_drift_psi",
    "q_vec_knn_recall", "q_vec_label_prop", "q_vec_mmr_topk",
    "q_vec_modularity", "q_vec_neardup", "q_vec_neardup_quantized",
    "q_vec_pagerank",
    "q_vec_ranking_metrics", "q_vec_rrf_fusion",
    "q_vec_semantic_contamination", "q_vec_semantic_dedup",
    "q_vec_semantic_pairs", "q_vec_sq8_distortion",
    "q_vec_matryoshka_recall",
    "q_vec_triangle_coeff", "q_waiting_suppliers",
    "q_window_distribution_funcs", "q_zset_range",
    // the four r10/r11 hash-mismatch rows (tail-adjacent; the
    // mismatches turned out to be a real HUGEINT typing bug, fixed
    // r12 — the preamble stays since they are still tail rows) +
    // the tail canary
    "q_text_dedup_curve", "q_text_stopwords", "q_text_vocab_growth",
    "q_vec_centroid_margin", "q_zz_canary")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] = {
    val base =
      ops.RelationalQueries.oracle ++
        ops.AffinityQueries.oracle ++
        ops.DemuxQueries.oracle ++
        ops.CdcQueries.oracle ++
        ops.TextQueries.oracle ++
        ops.VectorQueries.oracle ++
        ops.MultimodalQueries.oracle ++
        ops.LayoutQueries.oracle ++
        Map("q_aa_canary" -> canarySql, "q_zz_canary" -> canarySql)
    base.map { case (k, v) =>
      if (preambled(k)) k -> (lowAllocPreamble + v) else k -> v
    }
  }
}
