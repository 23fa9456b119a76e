package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array (replaces the Scala UDF
  * the first cut shipped: a UDF pays per-row Catalyst↔Scala
  * serialization of the whole token array; this walks the unsafe
  * array data directly). Bit mixing is identical to the UDF
  * (two MurmurHash3 string hashes per token, ±1 per bit, sign pack),
  * so hashes are unchanged.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"argument must be array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SimHash64.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.simhash($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash64 {
  def simhash(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        var h = scala.util.hashing.MurmurHash3.stringHash(t, 42).toLong
        h = (h << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(t, 7).toLong
            & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
