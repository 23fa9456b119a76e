package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint with an exact SQL twin — the ORACLE-PARITY
  * sibling of [[RollingHashMin]]: the window hash is the top 60 bits
  * of md5 (the same `('0x'||substr(md5(win),1,15))::BIGINT` any ANSI
  * engine computes), taken over every `k`-CHARACTER window of the
  * text and minimized. Windows are code-point indexed via the same
  * `substringSQL` Spark's own `substring` uses, so the window set
  * matches `substr(text, i, k)` in SQL engines exactly. Texts of ≤ k
  * characters hash as one whole-text window (md5 of "" for empty).
  *
  * O(windows · k) per document vs [[RollingHashMin]]'s O(n) — keep
  * the Rabin–Karp form as the production path at scale; this twin
  * exists so the content-defined-fingerprint capability has an
  * oracle-checked representative.
  */
case class Md5WinnowMin(child: Expression, k: Int)
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
    Md5WinnowMin.minWindowHash(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = Md5WinnowMin.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.minWindowHash($s, $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5WinnowMin = copy(child = newChild)

  override def prettyName: String = "graft_md5_winnow_min"
}

object Md5WinnowMin {

  def minWindowHash(text: UTF8String, k: Int): Long = {
    val bytes = text.getBytes
    // one pass to index code-point byte offsets — each window is then
    // a direct byte slice (the substringSQL form re-scanned from the
    // string head per window: O(chars²) on long docs)
    var nChars = 0
    var p = 0
    while (p < bytes.length) {
      p += UTF8String.numBytesForFirstByte(bytes(p))
      nChars += 1
    }
    if (nChars <= k) return Simhash60Md5.tokenHash60(bytes)
    val offs = new Array[Int](nChars + 1)
    var c = 0
    p = 0
    while (p < bytes.length) {
      offs(c) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      c += 1
    }
    offs(nChars) = bytes.length
    var best = Long.MaxValue
    var i = 0
    while (i <= nChars - k) {
      // bytes of substr(text, i+1, k): code points i until i+k
      val h = Simhash60Md5.tokenHash60(
        bytes, offs(i), offs(i + k) - offs(i))
      if (h < best) best = h
      i += 1
    }
    best
  }
}
