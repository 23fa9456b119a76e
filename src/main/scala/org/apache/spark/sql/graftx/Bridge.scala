package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ↔ Expression bridge.
  *
  * Spark 4 made the public `Column` API backend-agnostic and hid the
  * classic Expression constructor behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom Catalyst
  * expressions (graft.functions.*) still need to surface as Columns,
  * so this one-liner lives in an `org.apache.spark.sql` subpackage —
  * the standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The materialized RDD behind a checkpointed Dataset
    * (`ds.checkpoint`/`ds.localCheckpoint` both return a Dataset whose
    * analyzed plan is a `LogicalRDD` leaf). Iterative operators need
    * the handle to `unpersist` superseded rounds' checkpoint blocks —
    * `Dataset.unpersist` only consults the CacheManager, which never
    * sees checkpoint storage, so without this the blocks linger until
    * GC-driven ContextCleaner cleanup.
    */
  def leafRdd(ds: Dataset[_]): Option[RDD[_]] =
    ds.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }
}
