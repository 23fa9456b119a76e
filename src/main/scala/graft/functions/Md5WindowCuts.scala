package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries with an exact SQL twin — the
  * cut-position sibling of [[Md5WinnowMin]]: for every `k`-character
  * window whose 60-bit md5 hash (the same
  * `('0x'||substr(md5(win),1,15))::BIGINT` any ANSI engine computes)
  * has its low `maskBits` bits zero, emit the window's LAST character
  * position (1-based) as a cut end. Ascending by construction; the
  * document end is appended by the caller. Windows are code-point
  * indexed via one offset pass, so the window set matches
  * `substr(text, i, k)` in SQL engines exactly.
  *
  * One native pass replaces a per-position `substr`+`md5` HOF chain
  * (interpreted per element — measured ~10× slower at sf0.1).
  */
case class Md5WindowCuts(child: Expression, k: Int, maskBits: Int)
    extends UnaryExpression {

  require(k > 0, "window length must be positive")
  require(maskBits >= 1 && maskBits <= 59,
    "maskBits must be in [1, 59]")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
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
    Md5WindowCuts.cuts(input.asInstanceOf[UTF8String], k, maskBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = Md5WindowCuts.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.cuts($s, $k, $maskBits);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5WindowCuts = copy(child = newChild)

  override def prettyName: String = "graft_md5_window_cuts"
}

object Md5WindowCuts {

  def cuts(text: UTF8String, k: Int, maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    var nChars = 0
    var p = 0
    while (p < bytes.length) {
      p += UTF8String.numBytesForFirstByte(bytes(p))
      nChars += 1
    }
    if (nChars < k) return new GenericArrayData(Array.empty[Int])
    val offs = new Array[Int](nChars + 1)
    var c = 0
    p = 0
    while (p < bytes.length) {
      offs(c) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      c += 1
    }
    offs(nChars) = bytes.length
    val mask = (1L << maskBits) - 1L
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i <= nChars - k) {
      val h = Simhash60Md5.tokenHash60(
        bytes, offs(i), offs(i + k) - offs(i))
      if ((h & mask) == 0L) buf += i + k
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}
