package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of per-column bucket ids — the
  * write-side clustering key for multi-dimensional scan pruning.
  *
  * Input: an `array<bigint>` of n bucket ids, each in `[0, 2^bits)`.
  * Output: one long whose bit `b*n + c` is bit `b` of bucket `c`, so
  * rows close in EVERY dimension are close in the interleaved value.
  * Sorting a table by this value before writing gives parquet
  * row-group / file min-max bounds that are tight in all n dimensions
  * at once — a predicate on any clustered column then prunes, not
  * just a predicate on the single sort-leader of a linear sort.
  *
  * Exact integer math end to end (bucketing is floor division,
  * interleaving is shifts/masks), so the whole pipeline has a
  * bit-identical ANSI SQL twin — unlike hash-based clustering keys.
  *
  * Out-of-range bucket ids (negative, or `>= 2^bits`) fail loudly:
  * silently masking high bits would interleave garbage and destroy
  * the locality property without any visible error.
  */
case class ZOrderInterleave(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bits >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckFailure(s"bits must be >= 1, got $bits")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"argument must be array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ZOrderInterleave.interleave(input.asInstanceOf[ArrayData], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = ZOrderInterleave.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($a, $bits);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZOrderInterleave = copy(child = newChild)

  override def prettyName: String = "graft_zorder"
}

object ZOrderInterleave {

  /** ArrayData entry point (used by eval and codegen): rejects null
    * bucket elements with a descriptive error before `toLongArray`,
    * which would otherwise die with an opaque NPE — a null in any
    * clustering column must surface as a clear contract violation.
    */
  def interleave(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"zorder: null bucket at index $i — clustering columns " +
            "must be non-null (filter or coalesce nulls first)")
      i += 1
    }
    interleave(arr.toLongArray(), bits)
  }

  /** Bit-interleave `buckets` (little-endian by bit, column-major:
    * output bit `b*n + c` = bit `b` of `buckets(c)`). Throws on ids
    * outside `[0, 2^bits)` or when `n*bits > 63` (the result must fit
    * a non-negative long so range sorts order it like unsigned).
    */
  def interleave(buckets: Array[Long], bits: Int): Long = {
    val n = buckets.length
    if (n * bits > 63)
      throw new IllegalArgumentException(
        s"zorder: $n cols x $bits bits = ${n * bits} output bits; max 63")
    var z = 0L
    var c = 0
    while (c < n) {
      val v = buckets(c)
      if (v < 0L || (v >>> bits) != 0L)
        throw new IllegalArgumentException(
          s"zorder: bucket id $v of column $c outside [0, 2^$bits)")
      var b = 0
      while (b < bits) {
        z |= ((v >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    z
  }
}
