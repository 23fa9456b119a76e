package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 60-bit SimHash over a token array with an md5 per-token
  * hash — the ORACLE-PARITY variant of [[SimHash64]]: each token's
  * hash is bit-identical to `conv(substring(md5(tok),1,15),16,10)`
  * (the first 15 hex chars = top 60 bits of the md5 digest), the
  * same value any ANSI engine computes as
  * `('0x'||substr(md5(tok),1,15))::BIGINT`. Signature bit b is set
  * iff strictly more than half the tokens have bit b set (the ±1
  * majority vote). So the signature — and every hamming-distance
  * pair derived from it — is checkable against a SQL twin, while
  * staying a single scan-stage expression: no shuffle, no 61-column
  * aggregate, no interpreted higher-order-function fold (both
  * alternatives measured seconds of codegen-compile or per-token
  * boxing this native loop avoids).
  */
case class Simhash60Md5(child: Expression) extends UnaryExpression {

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
    Simhash60Md5.simhash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = Simhash60Md5.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.simhash($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Simhash60Md5 = copy(child = newChild)

  override def prettyName: String = "graft_simhash60_md5"
}

object Simhash60Md5 {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(token-utf8) — numerically equal to parsing
    * the digest's first 15 hex chars as an unsigned hex number.
    */
  def tokenHash60(utf8Bytes: Array[Byte]): Long =
    tokenHash60(utf8Bytes, 0, utf8Bytes.length)

  /** Slice form — lets window hashing reuse one byte array. */
  def tokenHash60(utf8Bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(utf8Bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def simhash(arr: ArrayData): Long = {
    val acc = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash60(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
