package graft

import org.apache.spark.sql.functions._
import graft.ops.{Vector => Vec}

/** The Catalyst plan-rewrite surface: sessions with the rule rewrite
  * the declarative HOF dot-product fold into the codegen expression;
  * sessions without it keep the interpreted HOF plan. Values must be
  * bit-identical either way.
  */
class ExtensionsSpec extends SparkSpec {

  // parquet-backed input: a local Seq would be constant-folded into a
  // LocalRelation before the plan can show either expression form
  private def hofQuery(s: org.apache.spark.sql.SparkSession) =
    Tables.embeddings(s, sf("sf0.001"))
      .select(col("vec_id"),
        Vec.decDotHof(col("embedding"), col("embedding")).as("dot"))

  test("RewriteDotProduct turns the HOF fold into ArrayDotProduct") {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      Seq(graft.plans.RewriteDotProduct)
    val q = hofQuery(s)
    assert(q.queryExecution.optimizedPlan.toString
      .contains("graft_dot"))
    // rewritten values == interpreted HOF values, bit for bit
    val rewritten = q.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val interpreted = hofQuery(spark).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rewritten == interpreted)
  }

  test("rule refuses folds whose multiply is not double-precision") {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      Seq(graft.plans.RewriteDotProduct)
    // bare-variable multiply over FLOAT arrays computes in float —
    // rewriting would change rounding, so the rule must not fire
    val q = Tables.embeddings(s, sf("sf0.001"))
      .select(aggregate(
        zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("graft_dot"))
  }

  test("sessions without the rule keep the HOF plan") {
    val q = hofQuery(spark)
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("graft_dot"))
    assert(q.queryExecution.optimizedPlan.toString
      .contains("aggregate"))
  }
}
