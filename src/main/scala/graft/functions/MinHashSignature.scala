package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen MinHash signature over a string array (shingles).
  *
  * One XXH64 string hash per element, then `numPerms` cheap splitmix64
  * re-mixes, tracking the per-permutation minimum — O(n + n·perms)
  * integer work in a tight loop. The HOF formulation (`array` of 32 ×
  * `array_min(transform(sh, xxhash64(p, _)))`) re-hashes every string
  * 32 times interpreted, which dominated the near-dup queries.
  *
  * Empty input arrays yield Long.MaxValue sentinels (callers produce a
  * non-empty shingle set for any document, including empty text).
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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

  override def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val n    = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s  = arr.getUTF8String(i)
        val h0 = MinHashSignature.hashString(s)
        var p  = 0
        while (p < numPerms) {
          val h = MinHashSignature.mix64(h0 + p * MinHashSignature.Golden)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls  = MinHashSignature.getClass.getName.stripSuffix("$")
      val n    = ctx.freshName("n")
      val i    = ctx.freshName("i")
      val p    = ctx.freshName("p")
      val mins = ctx.freshName("mins")
      val h0   = ctx.freshName("h0")
      val h    = ctx.freshName("h")
      val s    = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |final long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    final long $h0 = $cls.hashString($s);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      final long $h = $cls.mix64($h0 + $p * ${MinHashSignature.Golden}L);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSignature {
  final val Golden = 0x9e3779b97f4a7c15L

  /** XXH64 of the string bytes, seed 42. */
  def hashString(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** splitmix64 finalizer — cheap independent permutation mixes. */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
