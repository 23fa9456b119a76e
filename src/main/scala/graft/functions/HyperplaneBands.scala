package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sign-LSH band hashes of one vector in a single pass — the
  * native codegen form of the per-plane construction
  * `array(sum_over_bits(when(decDot(unit, plane_bj) >= 0, 1L << j)))`
  * that [[graft.ops.Vector.cosineNearDup]] used to assemble from
  * `nBands × bitsPerBand` separate [[ArrayDotProduct]] expressions.
  * With hundreds of planes (the production bit-growth config reaches
  * 320+ at 10× corpus scale) the per-plane assembly dominates the
  * banding stage: each plane is its own 64-literal CreateArray plus
  * its own expression tree, and the generated method grows past
  * JIT-friendly size. Here the plane matrix rides along ONCE as a
  * reference object and one tight loop computes every projection —
  * the banding stage becomes memory-bound on the vector scan.
  *
  * Bitwise-identical semantics to the per-plane form, which is what
  * keeps the oracle rows and recall fixtures untouched:
  *  - each projection is the same sequential left-to-right double
  *    MAC over the array ([[ArrayDotProduct]]'s fold order), so the
  *    sign of every dot matches exactly. Spark's comparison
  *    operators order NaN ABOVE every double, so the old
  *    `decDot >= 0` predicate was TRUE for NaN dots (zero-norm
  *    units hash to all-ones bands) — reproduced here as
  *    `!(acc < 0.0)`, which Java evaluates true for NaN;
  *  - a null element or a length mismatch made every per-plane dot
  *    NULL (first-null propagation over the SAME unit array), which
  *    the old `when(...).otherwise(0)` turned into all-zero hashes —
  *    reproduced here as an explicit all-zeros result;
  *  - a NULL array still yields NULL (UnaryExpression null
  *    propagation).
  *
  * `planes` is `[nBands * bitsPerBand][dim]`; bit `j` of band `b`
  * comes from plane `b * bitsPerBand + j`, OR-ed as `1L << j`
  * (identical to the old sum of disjoint powers of two).
  */
case class HyperplaneBands(
    child: Expression,
    planes: Array[Array[Double]],
    nBands: Int,
    bitsPerBand: Int)
    extends UnaryExpression {

  require(planes.length == nBands * bitsPerBand,
    s"planes (${planes.length}) must be nBands*bitsPerBand " +
      s"(${nBands * bitsPerBand})")
  require(planes.nonEmpty, "need at least one plane")

  private val dim: Int = planes(0).length

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"argument must be array<float|double>, got " +
              other.catalogString)
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val bands = new Array[Long](nBands)
    val n = arr.numElements()
    var poisoned = n != dim
    if (!poisoned) {
      var i = 0
      while (i < n && !poisoned) {
        if (arr.isNullAt(i)) poisoned = true
        i += 1
      }
    }
    if (!poisoned) {
      val u = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        u(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var b = 0
      while (b < nBands) {
        var h = 0L
        var j = 0
        while (j < bitsPerBand) {
          val p = planes(b * bitsPerBand + j)
          var acc = 0.0
          var k = 0
          while (k < dim) {
            acc += u(k) * p(k)
            k += 1
          }
          if (!(acc < 0.0)) h |= (1L << j)
          j += 1
        }
        bands(b) = h
        b += 1
      }
    }
    new GenericArrayData(bands)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getElem =
      if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val bands = ctx.freshName("bands")
      val u = ctx.freshName("u")
      val poisoned = ctx.freshName("poisoned")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
         |long[] $bands = new long[$nBands];
         |boolean $poisoned = $a.numElements() != $dim;
         |if (!$poisoned) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $poisoned = true; break; }
         |  }
         |}
         |if (!$poisoned) {
         |  double[] $u = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $u[$i] = ${getElem(a, i)};
         |  }
         |  for (int $b = 0; $b < $nBands; $b++) {
         |    long $h = 0L;
         |    for (int $j = 0; $j < $bitsPerBand; $j++) {
         |      double[] $p = $planesRef[$b * $bitsPerBand + $j];
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $acc += $u[$k] * $p[$k];
         |      }
         |      if (!($acc < 0.0)) $h |= (1L << $j);
         |    }
         |    $bands[$b] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_bands"
}
