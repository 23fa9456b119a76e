package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: minimum polynomial rolling
  * hash (Rabin–Karp, base 257, 64-bit wrap) over all byte windows of
  * length `k`. Texts shorter than `k` hash as a single window. O(n)
  * per document, codegen'd — the content-defined fingerprint used for
  * near-exact dedup at scale (robust to edits outside the minimizing
  * window, cheap to recompute incrementally).
  */
case class RollingHashMin(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "window length must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"argument must be string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minRollingHash(
      input.asInstanceOf[UTF8String].getBytes, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = RollingHashMin.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.minRollingHash($s.getBytes(), $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashMin = copy(child = newChild)

  override def prettyName: String = "graft_rolling_min"
}

object RollingHashMin {
  final val Base = 257L

  /** Min over all length-k byte windows of the polynomial hash
    * sum(b[i]·Base^(k-1-i)) with 64-bit wraparound; whole array if
    * shorter than k. Deterministic, endian-free, engine-free.
    */
  def minRollingHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      return h
    }
    // Base^(k-1) with wraparound, for removing the outgoing byte
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
