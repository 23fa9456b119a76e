package graft

import org.apache.spark.sql.functions._

/** Physical-plan evidence (SURVEY §4): the properties the 100 TB
  * design depends on are asserted against actual executed plans, not
  * just claimed — predicate pushdown and column pruning reach the
  * parquet scan, dimension joins broadcast, aggregations combine
  * map-side, and hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val p = plan(
      Tables.lineitem(spark, sf("sf0.001"))
        .filter(col("l_quantity") > 49.0)
        .select("l_orderkey"))
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_quantity,49.0)"),
      s"predicate not pushed:\n$p")
    // column pruning: the scan reads only the filter+projection
    // columns, not the 11-column table
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_extendedprice"),
      s"scan not pruned: $readSchema")
  }

  test("star-join plan broadcasts the dimension sides") {
    val d = sf("sf0.001")
    val p = plan(ops.Relational.revenueByNation(
      Tables.customer(spark, d), Tables.orders(spark, d),
      Tables.lineitem(spark, d), Tables.nation(spark, d)))
    assert(p.contains("BroadcastHashJoin"),
      s"no broadcast join in star plan:\n$p")
  }

  test("aggregations combine map-side (partial before the shuffle)") {
    val p = plan(
      Tables.lineitem(spark, sf("sf0.001"))
        .groupBy("l_returnflag").agg(sum("l_quantity")))
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no partial aggregation:\n$p")
  }

  test("scan-stage operators run inside whole-stage codegen") {
    // '*(n)' prefixes in the compact plan mark whole-stage-codegen
    // stages (the formatted explain spells them WholeStageCodegen)
    val p = plan(
      ops.Text.qualityScore(Tables.documents(spark, sf("sf0.001"))))
    assert(p.contains("*(1)"),
      s"quality score fell out of codegen:\n$p")
  }

  test("basket lift: aggregated item counts attach by broadcast, not a fact shuffle") {
    val p = plan(ops.Affinity.basketLift(
      Tables.lineitem(spark, sf("sf0.001")), minPairCount = 2L))
    assert(p.contains("BroadcastHashJoin"),
      s"item-count joins did not broadcast:\n$p")
  }

  test("prune audit: the predicate side rides a broadcast, never a sort-merge join") {
    import spark.implicits._
    val stats = Seq(("a", 1L, 0.0, 9.0, 10L))
      .toDF("layout", "file_id", "min_v", "max_v", "n_rows")
    val preds = Seq((1, 2.0, 3.0)).toDF("pred_id", "p_lo", "p_hi")
    val p = plan(ops.Layout.pruneAudit(stats, preds))
    assert(p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      s"prune audit join shape wrong:\n$p")
  }

  test("incremental view maintenance: plan touches the delta and the view, never a fact table") {
    import spark.implicits._
    val base = Seq(("a", 1.0, 1L)).toDF("key", "sum_v", "n_rows")
    val delta = Seq(("a", "I", 2.0, Option.empty[Double]))
      .toDF("key", "op", "v", "old_v")
    val p = plan(ops.Cdc.maintainSumCount(base, delta))
    // one partial+merge aggregation on the delta, one join keyed on
    // the view key — and the whole merge stays in codegen stages
    assert(p.contains("Partial") || p.contains("partial_sum"))
    assert(p.contains("Join"), s"no view-keyed merge join:\n$p")
  }
}
