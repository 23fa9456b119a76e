package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokens → distinct n-token shingle strings, in one native
  * pass.
  *
  * Bit-compatible with the declarative form it replaces —
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i+1, n))))` with the <n-token
  * fallback — including the edge semantics: ASCII-space trim
  * (UTF8String.trim), Java `\s+` split with limit -1 (trailing empty
  * token kept), empty text → single empty shingle, distinct keeps
  * first occurrence. The HOF chain interprets per window position
  * (slice allocates, concat_ws re-walks); this builds every shingle
  * from one token array in one pass.
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle width must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
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
    TokenShingles.shingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TokenShingles.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.shingles($s, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenShingles = copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object TokenShingles {

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val trimmed = text.trim()
    val toks: Array[String] =
      if (trimmed.numBytes() == 0) Array.empty
      else trimmed.toString.split("\\s+", -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < n) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }
}
