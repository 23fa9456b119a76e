package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketing = pre-shuffled storage: two tables bucketed by the join
  * key join WITHOUT any shuffle exchange — the co-located join that
  * makes repeated large-fact joins affordable at 100 TB (pay the
  * shuffle once at write time, never at read time).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of same-bucketed tables plans no shuffle exchange") {
    // (warehouse dir is a temp dir, set statically in SparkSpec)
    // disable auto-broadcast so a non-bucketed join WOULD shuffle
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps stages in QueryStageExec, hiding exchanges from
    // plan.collect — use the static planner for this assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = Tables.orders(spark, sf("sf0.001"))
      val customer = Tables.customer(spark, sf("sf0.001"))
      orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      customer.write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val nRows = joined.collect().map(_.getLong(1)).sum
      assert(nRows > 0)
      val plan = joined.queryExecution.executedPlan
      val shufflesBeforeAgg = plan.collect {
        case e: ShuffleExchangeExec => e
      }
      // exactly one shuffle: the final groupBy; the JOIN itself is
      // exchange-free because both sides are bucketed on the key
      assert(shufflesBeforeAgg.length == 1,
        s"expected only the agg shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
