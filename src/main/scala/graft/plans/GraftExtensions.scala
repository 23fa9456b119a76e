package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the declarative higher-order dot-product
  * fold — `aggregate(zip_with(a, b, (x, y) => x·y), 0.0, _+_)` — into
  * the native codegen [[graft.functions.ArrayDotProduct]].
  *
  * Why a Rule and not "just call the function": lambda-bearing HOFs
  * are interpreted per element and excluded from whole-stage codegen
  * and subexpression elimination, a measured ~50× penalty in pairwise
  * similarity joins. The rewrite lets USERS keep writing the
  * idiomatic declarative form (or port SQL that uses it) while every
  * plan that contains the pattern runs the tight primitive loop —
  * the two implementations are differential-tested bit-identical
  * (VectorSpec), so this is a pure physical improvement.
  *
  * The match is deliberately conservative: exact zero literal, a
  * multiply of the two zip lambda variables (bare or cast-to-double —
  * SimplifyCasts may have stripped them), an `acc + v` merge in
  * argument order, and an identity finish.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  /** The multiply must happen IN DOUBLE for the rewrite to preserve
    * results: either both operands are explicit casts to double (any
    * element type ArrayDotProduct can read), or the arrays are
    * already double-typed and the operands are bare variables. A
    * bare-variable multiply over float/int/long arrays computes in
    * the ELEMENT type (float rounding, integer wrap) and must not be
    * rewritten.
    */
  private def doubleArith(
      e: Expression,
      v: NamedLambdaVariable,
      arr: Expression
  ): Boolean = {
    val elem = arr.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => Some(et)
      case _ => None
    }
    val readable = elem.exists {
      case DoubleType | org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    e match {
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId && readable
      case nv: NamedLambdaVariable =>
        nv.exprId == v.exprId && elem.contains(DoubleType)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ma, mv, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if ((doubleArith(mx, x, l) && doubleArith(my, y, r)) ||
            (doubleArith(mx, y, r) && doubleArith(my, x, l))) &&
            sameVar(ma, acc) && sameVar(mv, v) &&
            fin.exprId == fv.exprId =>
        graft.functions.ArrayDotProduct(l, r)
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) wires the library's
  * plan rewrites into a session; sessions without the extension can
  * opt in at runtime via
  * `spark.experimental.extraOptimizations :+= RewriteDotProduct`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteDotProduct)
}
