package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Registry for the physical-design operators (Layout). Everything
  * here is exact integer/order arithmetic, so all three queries are
  * oracle-checked bit-for-bit.
  */
object LayoutQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Z-order clustering value over (l_partkey, l_suppkey), 8 bits
    // per dimension: the write-side key that makes parquet min-max
    // pruning work for predicates on either column. Exact long math
    // end to end (equi-width bucket div + bit interleave).
    "q_layout_zorder" -> ((s, d) =>
      Layout.withZValue(Tables.lineitem(s, d),
        Seq("l_partkey", "l_suppkey"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("z_value"))
        // order over ALL output columns: (l_orderkey, l_linenumber)
        // is NOT unique in the synthetic lineitem, and a non-total
        // sort leaves tie rows in engine-dependent positions
        .orderBy(col("z_value"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))),
    // 2-D prune audit: the same rectangle predicates against
    // insertion-ordered, partkey-sorted, and Z-ORDERED layouts of
    // lineitem — the measurement that justifies interleaved bits
    // (single-column sort prunes one dimension, Z-order prunes both)
    "q_layout_zorder_prune" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val z = Layout.withZValue(li, Seq("l_partkey", "l_suppkey"),
        bits = 8)
      val mm = li.agg(
        min(col("l_partkey")).as("mn_p"),
        max(col("l_partkey")).as("mx_p"))
      val asg = z.crossJoin(broadcast(mm)).select(
        col("l_partkey"), col("l_suppkey"),
        expr("l_orderkey div 1024").as("f_ins"),
        expr("(l_partkey - mn_p) * 64 div (mx_p - mn_p + 1)")
          .as("f_sort"),
        expr("z_value div 1024").as("f_z"))
      def stats(fcol: String, tag: String) = asg
        .groupBy(col(fcol).as("file_id"))
        .agg(min(col("l_partkey")).as("min_a"),
          max(col("l_partkey")).as("max_a"),
          min(col("l_suppkey")).as("min_b"),
          max(col("l_suppkey")).as("max_b"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(tag))
      val preds = Seq(
        (1, 10L, 30L, 0L, 1000000000L),   // partkey-narrow
        (2, 0L, 1000000000L, 2L, 5L),     // suppkey-narrow
        (3, 10L, 30L, 2L, 5L)             // both narrow
      ).toDF("pred_id", "a_lo", "a_hi", "b_lo", "b_hi")
      Layout.pruneAudit2D(
        stats("f_ins", "insertion")
          .unionByName(stats("f_sort", "partkey_sorted"))
          .unionByName(stats("f_z", "zorder")),
        preds)
    }),
    // Hilbert prune audit: the SAME rectangle predicates against
    // insertion-ordered, Z-ORDERED, and HILBERT layouts of lineitem —
    // closes the layout family's measurement loop: q_layout_hilbert
    // proves the curve's locality (zero non-neighbor steps),
    // this measures what that locality BUYS a min/max-pruning
    // scanner vs the Z-curve on identical file granularity
    "q_layout_hilbert_prune" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val both = Layout.withHilbertValue(
        Layout.withZValue(li, Seq("l_partkey", "l_suppkey"), bits = 8),
        "l_partkey", "l_suppkey", bits = 8)
      val asg = both.select(
        col("l_partkey"), col("l_suppkey"),
        expr("l_orderkey div 1024").as("f_ins"),
        expr("z_value div 1024").as("f_z"),
        expr("hilbert_value div 1024").as("f_h"))
      def stats(fcol: String, tag: String) = asg
        .groupBy(col(fcol).as("file_id"))
        .agg(min(col("l_partkey")).as("min_a"),
          max(col("l_partkey")).as("max_a"),
          min(col("l_suppkey")).as("min_b"),
          max(col("l_suppkey")).as("max_b"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(tag))
      val preds = Seq(
        (1, 10L, 30L, 0L, 1000000000L),   // partkey-narrow
        (2, 0L, 1000000000L, 2L, 5L),     // suppkey-narrow
        (3, 10L, 30L, 2L, 5L)             // both narrow
      ).toDF("pred_id", "a_lo", "a_hi", "b_lo", "b_hi")
      Layout.pruneAudit2D(
        stats("f_ins", "insertion")
          .unionByName(stats("f_z", "zorder"))
          .unionByName(stats("f_h", "hilbert")),
        preds)
    }),
    // export-integrity manifest over the lang-partitioned delivery:
    // counts, byte volume, order-independent md5-int checksum
    "q_export_manifest" -> ((s, d) =>
      Export.manifest(Tables.documents(s, d), col("lang"),
        col("doc_id"), col("text"))),
    // byte-budgeted shard manifest (WebDataset-style): docs pack in
    // id order into ~8 KiB shards within each lang; a doc never
    // splits, shards never cross the partition
    "q_export_shards" -> ((s, d) =>
      Export.shardManifest(Tables.documents(s, d), col("lang"),
        col("doc_id"), col("text"), budgetBytes = 8192L)),
    // bloom-filter sizing advisor: per 512-row orders file, exact
    // q20 expected FPP of a point-lookup filter on o_custkey over a
    // (m_bits x k) config grid — the skipping math zone maps can't do
    "q_layout_bloom_advisor" -> ((s, d) =>
      Layout.bloomAdvisor(
        Tables.orders(s, d).select(
          expr("o_orderkey div 512").as("file_id"),
          col("o_custkey")),
        "file_id", "o_custkey")),
    // data-skipping audit: the SAME range predicates against
    // insertion-ordered vs range-clustered file layouts of orders —
    // min/max pruning measured (files/rows scanned, exact skip ppm),
    // the before/after number that justifies clustering
    "q_layout_prune_audit" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      val ins = o
        .groupBy(expr("o_orderkey div 512").as("file_id"))
        .agg(min(col("o_totalprice")).as("min_v"),
          max(col("o_totalprice")).as("max_v"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit("insertion"))
      val bounds = Layout.rangeBoundaries(o, "o_totalprice", 64)
      val clustered = o
        .crossJoin(broadcast(bounds))
        .filter(col("upper_bound") >= col("o_totalprice"))
        .groupBy(col("o_orderkey"), col("o_totalprice"))
        .agg(min(col("range_id")).as("file_id"))
        .groupBy(col("file_id"))
        .agg(min(col("o_totalprice")).as("min_v"),
          max(col("o_totalprice")).as("max_v"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit("range_clustered"))
      val preds = Seq(
        (1, 100000.0, 120000.0),
        (2, 0.0, 100000.0),
        (3, 400000.0, 600000.0)
      ).toDF("pred_id", "p_lo", "p_hi")
      Layout.pruneAudit(ins.unionByName(clustered), preds)
    }),
    // exact range-partition boundaries (16 balanced ranges of orders
    // by o_totalprice) computed from the value histogram — the
    // reproducible form of repartitionByRange's sampled planning
    "q_layout_range_bounds" -> ((s, d) =>
      Layout.rangeBoundaries(Tables.orders(s, d), "o_totalprice", 16)
        .orderBy(col("range_id"))),
    // exact rank-quantile boundaries of a UNIQUE key (o_orderkey,
    // 12 ranges) via the two-pass coarse-cell scheme — no global
    // window anywhere in the plan; ROW_NUMBER twin in the oracle
    // re-proves exactness every sweep
    "q_layout_key_quantiles" -> ((s, d) =>
      Layout.exactKeyQuantiles(Tables.orders(s, d), "o_orderkey", 12)),
    // 2-D Hilbert clustering value over (l_partkey, l_suppkey), 8
    // bits/dim — the better-locality sibling of q_layout_zorder;
    // bit-identical xy2d walk replayed in the oracle
    "q_layout_hilbert" -> ((s, d) =>
      Layout.withHilbertValue(Tables.lineitem(s, d),
        "l_partkey", "l_suppkey", bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("hilbert_value"))
        .orderBy(col("hilbert_value"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"))),
    // per-file stabbing depth of insertion-ordered vs key-sorted
    // synthetic files of lineitem on l_partkey — the predicate-free
    // clustering metric (depth ~ #files vs depth ~ 1-2); exact
    // boundary sweep, windows only over the distinct-boundary stream
    "q_layout_overlap_depth" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
      val mm = li.agg(min(col("l_partkey")).as("mn_p"),
        max(col("l_partkey")).as("mx_p"))
      val asg = li.crossJoin(broadcast(mm)).select(
        col("l_partkey"),
        expr("l_orderkey div 1024").as("f_ins"),
        expr("(l_partkey - mn_p) * 64 div (mx_p - mn_p + 1)")
          .as("f_sort"))
      def stats(fcol: String, tag: String) = asg
        .groupBy(col(fcol).as("file_id"))
        .agg(min(col("l_partkey")).as("min_v"),
          max(col("l_partkey")).as("max_v"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(tag))
      Layout.fileOverlapDepth(
        stats("f_ins", "insertion")
          .unionByName(stats("f_sort", "partkey_sorted")))
        .orderBy(col("layout"), col("file_id"))
    }),
    // heavy-hitter profile of lineitem.l_partkey with the salt factor
    // that would level each key across 32 shuffle partitions
    "q_layout_skew" -> ((s, d) =>
      Layout.keySkewProfile(Tables.lineitem(s, d), "l_partkey",
        topN = 20, nParts = 32)),
    // insertion-order correlation of o_orderdate: does the column
    // arrive value-ordered (prunes without a rewrite) or random
    // (a clustering rewrite buys real skipping)? bucketed lag
    // windows, boundary pairs excluded by construction
    "q_layout_order_corr" -> ((s, d) =>
      Layout.insertionOrderCorrelation(Tables.orders(s, d),
        "o_orderkey", "o_orderdate", bucketSize = 1024L)),
    // small-file compaction plan over a file-statistics frame
    // (documents stands in: part_key = lang, file_id = doc_id,
    // bytes = n_chars — the operator's contract is any catalog
    // LIST output); first-fit walk in id order per partition,
    // 2000-byte target bins, exact linear-recursive-CTE twin
    // MVCC snapshot read over a synthesized add/remove file log:
    // every part is a file added at v = partkey%50; every third is
    // removed at v_add+1+(partkey%29); every ninth re-added (the
    // compaction-rewrite revival) at v_add+40 — resolve live set as
    // of version 45
    "q_layout_snapshot" -> ((s, d) => {
      val base = Tables.part(s, d).select(
        col("p_partkey").as("file_id"),
        (col("p_size").cast("long") * 1000L).as("n_rows"),
        pmod(col("p_partkey"), lit(50L)).as("v_add"))
      val log = base
        .select(col("file_id"), lit("A").as("op"),
          col("v_add").as("version"), col("n_rows"))
        .unionByName(base.filter(pmod(col("file_id"), lit(3L)) === 0)
          .select(col("file_id"), lit("R").as("op"),
            (col("v_add") + 1L + pmod(col("file_id"), lit(29L)))
              .as("version"), col("n_rows")))
        .unionByName(base.filter(pmod(col("file_id"), lit(9L)) === 0)
          .select(col("file_id"), lit("A").as("op"),
            (col("v_add") + 40L).as("version"), col("n_rows")))
      Layout.snapshotLiveFiles(log, asOfVersion = 45L)
        .orderBy(col("file_id"))
    }),
    "q_layout_compaction" -> ((s, d) =>
      Layout.compactionPlan(
        Tables.documents(s, d).select(
          col("lang").as("part_key"),
          col("doc_id").as("file_id"),
          col("n_chars").as("bytes")),
        targetBytes = 2000L)
        .orderBy(col("part_key"), col("file_id")))
  )

  /** ANSI twin of [[Layout.withHilbertValue]]'s xy2d walk: one CTE
    * per bit from the top (each = the Spark chain's per-step
    * projection; the inner subquery computes the quadrant bits from
    * the INPUT hx/hy so the outer swap/flip reads pre-step values,
    * exactly like the named-column Spark steps).
    */
  private def hilbertChainSql(bits: Int, keep: String): String =
    ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == bits - 1) "h_in" else s"h${i + 1}"
      s"""h$i AS (
         |  SELECT $keep,
         |    hd + ${s * s} * xor(3 * rx, ry) AS hd,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - hy ELSE hy END ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - hx ELSE hx END ELSE hy END AS hy
         |  FROM (SELECT *,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM $prev) t)""".stripMargin
    }.mkString(",\n")

  /** q20 square-and-multiply chain as stacked CTEs, `bits` wide —
    * the Text.q20powChainSql shape generalized past 8 bits (the
    * bloom exponent k·n_keys needs 13). Each step reads exponent
    * bit `i` of `eCol`, multiplies `acc` by the pre-square `pw`,
    * floors to q20 — identical to the Spark named-column chain.
    */
  private def q20ChainSql(tag: String, from: String, keep: String,
      eCol: String, bits: Int): String =
    (0 until bits).map { bit =>
      val prev = if (bit == 0) from else s"$tag${bit - 1}"
      s"""$tag$bit AS (
         |  SELECT $keep,
         |    CASE WHEN ($eCol // ${1L << bit}) % 2 = 1
         |      THEN (acc * pw) // 1048576 ELSE acc END AS acc,
         |    (pw * pw) // 1048576 AS pw
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")

  private val bloomAdvisorOracle: String = {
    val grid = Seq(1 << 14, 1 << 16, 1 << 18)
      .flatMap(m => Seq(1, 3, 5, 7).map(k => s"($m, $k)"))
      .mkString(", ")
    val keep = "file_id, n_keys, m_bits, k, e1"
    s"""WITH f AS (
       |  SELECT o_orderkey // 512 AS file_id,
       |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_keys
       |  FROM orders GROUP BY 1),
       |grid(m_bits, k) AS (VALUES $grid),
       |p_in AS (
       |  SELECT file_id, n_keys, m_bits, k,
       |    CAST(k * n_keys AS BIGINT) AS e1,
       |    CAST(1048576 AS BIGINT) AS acc,
       |    CAST(1048576 - 1048576 // m_bits AS BIGINT) AS pw
       |  FROM f CROSS JOIN grid),
       |${q20ChainSql("p", "p_in", keep, "e1", 13)},
       |q_pre AS (
       |  SELECT $keep, 1048576 - acc AS pw FROM p12),
       |q_in AS (
       |  SELECT *, CAST(1048576 AS BIGINT) AS acc FROM q_pre),
       |${q20ChainSql("q", "q_in", keep, "k", 3)}
       |SELECT file_id, m_bits, k, n_keys,
       |  (acc * 1000000) // 1048576 AS fpp_ppm,
       |  m_bits * 1000 // n_keys AS bits_per_key_milli,
       |  CAST(CASE WHEN (acc * 1000000) // 1048576 <= 10000
       |    THEN 1 ELSE 0 END AS BIGINT) AS effective
       |FROM q2 ORDER BY file_id, m_bits, k""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_layout_bloom_advisor" -> bloomAdvisorOracle,
    "q_layout_hilbert" -> {
      val keep = "l_orderkey, l_linenumber, l_partkey, l_suppkey"
      s"""WITH mm AS (
         |  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
         |         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
         |  FROM lineitem),
         |h_in AS (
         |  SELECT $keep,
         |    CAST((CAST(l_partkey - mn1 AS BIGINT) * 256)
         |         // (mx1 - mn1 + 1) AS BIGINT) AS hx,
         |    CAST((CAST(l_suppkey - mn2 AS BIGINT) * 256)
         |         // (mx2 - mn2 + 1) AS BIGINT) AS hy,
         |    CAST(0 AS BIGINT) AS hd
         |  FROM lineitem, mm),
         |${hilbertChainSql(8, keep)}
         |SELECT $keep, CAST(hd AS BIGINT) AS hilbert_value
         |FROM h0
         |ORDER BY hilbert_value, l_orderkey, l_linenumber,
         |  l_partkey, l_suppkey""".stripMargin
    },
    // same equi-width bucket + interleave in SQL: bit b of bucket 1
    // lands at position 2b, of bucket 2 at 2b+1 (column-major,
    // little-endian by bit — ZOrderInterleave's layout)
    "q_layout_zorder" ->
      """WITH mm AS (
        |  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
        |         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
        |  FROM lineitem),
        |b AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST((CAST(l_partkey - mn1 AS BIGINT) * 256)
        |         // (mx1 - mn1 + 1) AS BIGINT) AS b1,
        |    CAST((CAST(l_suppkey - mn2 AS BIGINT) * 256)
        |         // (mx2 - mn2 + 1) AS BIGINT) AS b2
        |  FROM lineitem, mm),
        |br AS (
        |  SELECT ROW_NUMBER() OVER () AS rid, * FROM b),
        |z AS (
        |  SELECT rid, l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    SUM((((b1 >> i) & 1) << (2 * i)) +
        |        (((b2 >> i) & 1) << (2 * i + 1))) AS z_value
        |  FROM br, generate_series(0, 7) AS g(i)
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       CAST(z_value AS BIGINT) AS z_value
        |FROM z
        |ORDER BY z_value, l_orderkey, l_linenumber, l_partkey,
        |  l_suppkey""".stripMargin,
    // same closed form: the value owning cumulative interval
    // (cum-cnt, cum] bounds exactly the ranges whose ceil targets
    // fall inside it (DuckDB's generate_series yields an empty list
    // when lo > hi, matching the Spark side's hi >= lo filter)
    "q_layout_zorder_prune" ->
      """WITH mm AS (
        |  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
        |         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
        |  FROM lineitem),
        |b AS (
        |  SELECT l_orderkey, l_partkey, l_suppkey,
        |    CAST((CAST(l_partkey - mn1 AS BIGINT) * 256)
        |         // (mx1 - mn1 + 1) AS BIGINT) AS b1,
        |    CAST((CAST(l_suppkey - mn2 AS BIGINT) * 256)
        |         // (mx2 - mn2 + 1) AS BIGINT) AS b2,
        |    mn1, mx1
        |  FROM lineitem, mm),
        |br AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM b),
        |z AS (
        |  SELECT rid, l_orderkey, l_partkey, l_suppkey, mn1, mx1,
        |    SUM((((b1 >> i) & 1) << (2 * i)) +
        |        (((b2 >> i) & 1) << (2 * i + 1))) AS z_value
        |  FROM br, generate_series(0, 7) AS g(i)
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |asg AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_orderkey // 1024 AS f_ins,
        |    (l_partkey - mn1) * 64 // (mx1 - mn1 + 1) AS f_sort,
        |    CAST(z_value AS BIGINT) // 1024 AS f_z
        |  FROM z),
        |fs AS (
        |  SELECT 'insertion' AS layout, f_ins AS file_id,
        |    MIN(l_partkey) AS min_a, MAX(l_partkey) AS max_a,
        |    MIN(l_suppkey) AS min_b, MAX(l_suppkey) AS max_b,
        |    COUNT(*) AS n_rows
        |  FROM asg GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'partkey_sorted', f_sort, MIN(l_partkey),
        |    MAX(l_partkey), MIN(l_suppkey), MAX(l_suppkey), COUNT(*)
        |  FROM asg GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'zorder', f_z, MIN(l_partkey), MAX(l_partkey),
        |    MIN(l_suppkey), MAX(l_suppkey), COUNT(*)
        |  FROM asg GROUP BY 1, 2),
        |p AS (
        |  SELECT * FROM (VALUES
        |    (1, 10, 30, 0, 1000000000),
        |    (2, 0, 1000000000, 2, 5),
        |    (3, 10, 30, 2, 5))
        |    AS t(pred_id, a_lo, a_hi, b_lo, b_hi))
        |SELECT layout, pred_id, COUNT(*) AS n_files,
        |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
        |  COUNT(*) FILTER (max_a >= a_lo AND min_a <= a_hi
        |    AND max_b >= b_lo AND min_b <= b_hi) AS files_scanned,
        |  CAST(SUM(CASE WHEN max_a >= a_lo AND min_a <= a_hi
        |    AND max_b >= b_lo AND min_b <= b_hi THEN n_rows
        |    ELSE 0 END) AS BIGINT) AS rows_scanned,
        |  (COUNT(*) - COUNT(*) FILTER (max_a >= a_lo
        |    AND min_a <= a_hi AND max_b >= b_lo AND min_b <= b_hi))
        |    * 1000000 // COUNT(*) AS skip_ppm
        |FROM fs CROSS JOIN p
        |GROUP BY 1, 2
        |ORDER BY layout, pred_id""".stripMargin,
    // the zorder_prune skeleton + the hilbert walk on the SAME
    // buckets (b1/b2 ride the chain's keep-list so the Z interleave
    // reads the identical quantization the walk consumed)
    "q_layout_hilbert_prune" -> {
      val keep = "l_orderkey, l_partkey, l_suppkey, b1, b2"
      s"""WITH mm AS (
         |  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
         |         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
         |  FROM lineitem),
         |h_in AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey,
         |    CAST((CAST(l_partkey - mn1 AS BIGINT) * 256)
         |         // (mx1 - mn1 + 1) AS BIGINT) AS b1,
         |    CAST((CAST(l_suppkey - mn2 AS BIGINT) * 256)
         |         // (mx2 - mn2 + 1) AS BIGINT) AS b2,
         |    CAST((CAST(l_partkey - mn1 AS BIGINT) * 256)
         |         // (mx1 - mn1 + 1) AS BIGINT) AS hx,
         |    CAST((CAST(l_suppkey - mn2 AS BIGINT) * 256)
         |         // (mx2 - mn2 + 1) AS BIGINT) AS hy,
         |    CAST(0 AS BIGINT) AS hd
         |  FROM lineitem, mm),
         |${hilbertChainSql(8, keep)},
         |br AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM h0),
         |z AS (
         |  SELECT rid, l_orderkey, l_partkey, l_suppkey, hd,
         |    SUM((((b1 >> i) & 1) << (2 * i)) +
         |        (((b2 >> i) & 1) << (2 * i + 1))) AS z_value
         |  FROM br, generate_series(0, 7) AS g(i)
         |  GROUP BY 1, 2, 3, 4, 5),
         |asg AS (
         |  SELECT l_partkey, l_suppkey,
         |    l_orderkey // 1024 AS f_ins,
         |    CAST(z_value AS BIGINT) // 1024 AS f_z,
         |    CAST(hd AS BIGINT) // 1024 AS f_h
         |  FROM z),
         |fs AS (
         |  SELECT 'insertion' AS layout, f_ins AS file_id,
         |    MIN(l_partkey) AS min_a, MAX(l_partkey) AS max_a,
         |    MIN(l_suppkey) AS min_b, MAX(l_suppkey) AS max_b,
         |    COUNT(*) AS n_rows
         |  FROM asg GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'zorder', f_z, MIN(l_partkey), MAX(l_partkey),
         |    MIN(l_suppkey), MAX(l_suppkey), COUNT(*)
         |  FROM asg GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'hilbert', f_h, MIN(l_partkey), MAX(l_partkey),
         |    MIN(l_suppkey), MAX(l_suppkey), COUNT(*)
         |  FROM asg GROUP BY 1, 2),
         |p AS (
         |  SELECT * FROM (VALUES
         |    (1, 10, 30, 0, 1000000000),
         |    (2, 0, 1000000000, 2, 5),
         |    (3, 10, 30, 2, 5))
         |    AS t(pred_id, a_lo, a_hi, b_lo, b_hi))
         |SELECT layout, pred_id, COUNT(*) AS n_files,
         |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         |  COUNT(*) FILTER (max_a >= a_lo AND min_a <= a_hi
         |    AND max_b >= b_lo AND min_b <= b_hi) AS files_scanned,
         |  CAST(SUM(CASE WHEN max_a >= a_lo AND min_a <= a_hi
         |    AND max_b >= b_lo AND min_b <= b_hi THEN n_rows
         |    ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  (COUNT(*) - COUNT(*) FILTER (max_a >= a_lo
         |    AND min_a <= a_hi AND max_b >= b_lo AND min_b <= b_hi))
         |    * 1000000 // COUNT(*) AS skip_ppm
         |FROM fs CROSS JOIN p
         |GROUP BY 1, 2
         |ORDER BY layout, pred_id""".stripMargin
    },
    "q_export_manifest" ->
      """SELECT lang AS part, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT)
        |    AS payload_bytes,
        |  CAST(SUM(CAST(('0x' || substr(md5(doc_id || ':' || text),
        |    1, 15)) AS BIGINT) % 1000000007) AS BIGINT) AS checksum
        |FROM documents
        |GROUP BY lang ORDER BY part""".stripMargin,
    "q_export_shards" ->
      """WITH b AS (
        |  SELECT lang AS part, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        |  FROM documents),
        |c AS (
        |  SELECT part, doc_id, bytes,
        |    SUM(bytes) OVER (PARTITION BY part ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM b)
        |SELECT part, CAST(GREATEST(cum - 1, 0) // 8192 AS BIGINT)
        |  AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(bytes) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
        |FROM c GROUP BY 1, 2
        |ORDER BY part, shard_id""".stripMargin,
    "q_layout_prune_audit" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice FROM orders),
        |a AS (
        |  SELECT o_orderkey // 512 AS file_id,
        |    MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v,
        |    COUNT(*) AS n_rows
        |  FROM o GROUP BY 1),
        |hist AS (
        |  SELECT o_totalprice AS value, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT value, cnt, SUM(cnt) OVER (ORDER BY value) AS cum,
        |         SUM(cnt) OVER () AS n_rows
        |  FROM hist),
        |bounds AS (
        |  SELECT CAST(UNNEST(generate_series(
        |           CAST((cum - cnt) * 64 // n_rows + 1 AS BIGINT),
        |           CAST(cum * 64 // n_rows AS BIGINT))) AS INTEGER)
        |         AS range_id,
        |         value AS upper_bound
        |  FROM cum),
        |asg AS (
        |  SELECT o.o_orderkey, o.o_totalprice,
        |    MIN(b.range_id) AS file_id
        |  FROM o JOIN bounds b ON b.upper_bound >= o.o_totalprice
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT file_id, MIN(o_totalprice) AS min_v,
        |    MAX(o_totalprice) AS max_v, COUNT(*) AS n_rows
        |  FROM asg GROUP BY 1),
        |fs AS (
        |  SELECT 'insertion' AS layout, file_id, min_v, max_v, n_rows
        |  FROM a
        |  UNION ALL
        |  SELECT 'range_clustered', file_id, min_v, max_v, n_rows
        |  FROM c),
        |p AS (
        |  SELECT * FROM (VALUES
        |    (1, 100000.0, 120000.0),
        |    (2, 0.0, 100000.0),
        |    (3, 400000.0, 600000.0)) AS t(pred_id, p_lo, p_hi))
        |SELECT layout, pred_id, p_lo, p_hi,
        |  COUNT(*) AS n_files,
        |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
        |  COUNT(*) FILTER (max_v >= p_lo AND min_v <= p_hi)
        |    AS files_scanned,
        |  CAST(SUM(CASE WHEN max_v >= p_lo AND min_v <= p_hi
        |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
        |  (COUNT(*) - COUNT(*) FILTER (max_v >= p_lo
        |    AND min_v <= p_hi)) * 1000000 // COUNT(*) AS skip_ppm
        |FROM fs CROSS JOIN p
        |GROUP BY 1, 2, 3, 4
        |ORDER BY layout, pred_id""".stripMargin,
    "q_layout_range_bounds" ->
      """WITH hist AS (
        |  SELECT o_totalprice AS value, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT value, cnt, SUM(cnt) OVER (ORDER BY value) AS cum,
        |         SUM(cnt) OVER () AS n_rows
        |  FROM hist)
        |SELECT CAST(UNNEST(generate_series(
        |         CAST((cum - cnt) * 16 // n_rows + 1 AS BIGINT),
        |         CAST(cum * 16 // n_rows AS BIGINT))) AS INTEGER)
        |       AS range_id,
        |       value AS upper_bound
        |FROM cum
        |ORDER BY range_id""".stripMargin,
    "q_layout_key_quantiles" ->
      """WITH r AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders),
        |t AS (
        |  SELECT CAST(x AS INTEGER) AS range_id,
        |    ((x + 1) * nd + 11) // 12 AS r
        |  FROM range(12) s(x)
        |  CROSS JOIN (SELECT COUNT(*) AS nd FROM orders) n)
        |SELECT t.range_id, r.k AS upper_bound
        |FROM t JOIN r ON r.rn = t.r
        |ORDER BY range_id""".stripMargin,
    "q_layout_overlap_depth" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |mm AS (
        |  SELECT MIN(l_partkey) AS mn_p, MAX(l_partkey) AS mx_p
        |  FROM li),
        |asg AS (
        |  SELECT l_partkey, l_orderkey // 1024 AS f_ins,
        |    (l_partkey - mm.mn_p) * 64 // (mm.mx_p - mm.mn_p + 1)
        |      AS f_sort
        |  FROM li CROSS JOIN mm),
        |st AS (
        |  SELECT 'insertion' AS layout, f_ins AS file_id,
        |    MIN(l_partkey) AS min_v, MAX(l_partkey) AS max_v,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM asg GROUP BY 2
        |  UNION ALL
        |  SELECT 'partkey_sorted', f_sort, MIN(l_partkey),
        |    MAX(l_partkey), CAST(COUNT(*) AS BIGINT)
        |  FROM asg GROUP BY 2),
        |ev AS (
        |  SELECT layout, min_v AS v, 1 AS delta FROM st
        |  UNION ALL
        |  SELECT layout, max_v, -1 FROM st),
        |pv AS (
        |  SELECT layout, v,
        |    CAST(COUNT(CASE WHEN delta = 1 THEN 1 END) AS BIGINT)
        |      AS s,
        |    CAST(COUNT(CASE WHEN delta = -1 THEN 1 END) AS BIGINT)
        |      AS e
        |  FROM ev GROUP BY 1, 2),
        |da AS (
        |  SELECT layout, v AS min_v,
        |    CAST(SUM(s) OVER (PARTITION BY layout ORDER BY v)
        |      AS BIGINT)
        |    - CAST(SUM(e) OVER (PARTITION BY layout ORDER BY v)
        |      AS BIGINT) + e AS depth
        |  FROM pv)
        |SELECT st.layout, st.file_id, st.min_v, st.max_v, st.n_rows,
        |  da.depth
        |FROM st JOIN da
        |  ON st.layout = da.layout AND st.min_v = da.min_v
        |ORDER BY st.layout, st.file_id""".stripMargin,
    "q_layout_order_corr" ->
      """WITH b AS (
        |  SELECT o_orderdate AS v,
        |    LAG(o_orderdate) OVER (
        |      PARTITION BY CAST(o_orderkey AS BIGINT) // 1024
        |      ORDER BY o_orderkey) AS prev
        |  FROM orders),
        |s AS (
        |  SELECT CAST(COUNT(prev) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(CASE WHEN v >= prev THEN 1 END) AS BIGINT)
        |      AS n_ordered
        |  FROM b)
        |SELECT n_pairs, n_ordered,
        |  CASE WHEN n_pairs = 0 THEN NULL
        |       ELSE n_ordered * 1000000 // n_pairs
        |  END AS ordered_ppm
        |FROM s""".stripMargin,
    "q_layout_skew" ->
      """WITH byk AS (
        |  SELECT l_partkey AS key, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(cnt) AS total FROM byk)
        |SELECT key, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_factor
        |FROM byk, tot
        |ORDER BY cnt DESC, key
        |LIMIT 20""".stripMargin,
    // the q_text_pack_firstfit recurrence over file stats: per
    // part_key in file_id order, cut a bin when the next file would
    // overflow 2000 bytes; files never split, oversize files alone
    "q_layout_snapshot" ->
      """WITH base AS (
        |  SELECT p_partkey AS file_id,
        |    CAST(p_size AS BIGINT) * 1000 AS n_rows,
        |    p_partkey % 50 AS v_add
        |  FROM part),
        |lg AS (
        |  SELECT file_id, 'A' AS op, v_add AS version, n_rows
        |  FROM base
        |  UNION ALL
        |  SELECT file_id, 'R', v_add + 1 + (file_id % 29), n_rows
        |  FROM base WHERE file_id % 3 = 0
        |  UNION ALL
        |  SELECT file_id, 'A', v_add + 40, n_rows
        |  FROM base WHERE file_id % 9 = 0),
        |res AS (
        |  SELECT file_id,
        |    FIRST(op ORDER BY version DESC) AS last_op,
        |    CAST(MAX(version) AS BIGINT) AS live_version,
        |    CAST(FIRST(n_rows ORDER BY version DESC) AS BIGINT)
        |      AS n_rows
        |  FROM lg WHERE version <= 45 GROUP BY file_id)
        |SELECT file_id, live_version, n_rows
        |FROM res WHERE last_op = 'A'
        |ORDER BY file_id""".stripMargin,
    "q_layout_compaction" ->
      """WITH RECURSIVE f AS (
        |  SELECT lang AS part_key, doc_id AS file_id,
        |    CAST(n_chars AS BIGINT) AS bytes
        |  FROM documents),
        |o AS (
        |  SELECT *, row_number() OVER (PARTITION BY part_key
        |    ORDER BY file_id) AS rn
        |  FROM f),
        |s AS (
        |  SELECT part_key, rn, file_id, bytes,
        |    CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_off,
        |    bytes AS fill
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.part_key, o.rn, o.file_id, o.bytes,
        |    CASE WHEN s.fill > 0 AND s.fill + o.bytes > 2000
        |         THEN s.bin_id + 1 ELSE s.bin_id END,
        |    CASE WHEN s.fill > 0 AND s.fill + o.bytes > 2000
        |         THEN CAST(0 AS BIGINT) ELSE s.fill END,
        |    CASE WHEN s.fill > 0 AND s.fill + o.bytes > 2000
        |         THEN o.bytes ELSE s.fill + o.bytes END
        |  FROM s JOIN o ON o.part_key = s.part_key AND o.rn = s.rn + 1)
        |SELECT part_key, file_id, bytes, bin_id, bin_off
        |FROM s ORDER BY part_key, file_id""".stripMargin
  )
}
