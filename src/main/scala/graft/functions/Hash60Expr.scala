package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash — the faster form of [[graft.ops.Hashing.h60]]'s
  * `conv(substring(md5(c), 1, 15), 16, 10)` chain, which sits in EVERY
  * dedup / sampling / fingerprint / search hot path. The built-in chain
  * materializes a 32-char hex UTF8String per row, substrings it, then
  * re-parses 15 hex digits back into a long; this expression reads the SAME
  * value straight off the digest bytes: the first 15 hex chars are the high
  * 60 bits of the first 8 digest bytes, so `bigEndian(d[0..7]) >>> 4` is
  * bit-identical to the old formula — every existing DuckDB oracle
  * (`CAST('0x' || substr(md5(e),1,15) AS BIGINT)`) keeps matching unchanged.
  * Equivalence is property-tested (`PropertySpec`) including forced codegen.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "h60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h60 expects a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Hash60Kernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder, same pattern as JsonMergePatch/JsonRedact
    val cls = Hash60Kernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[Hash60]] — companion-less object so scalac emits static
  * forwarders the generated Java can call directly.
  */
object Hash60Kernel {

  // MessageDigest is stateful — one per thread, reset per row
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4 // keep the first 15 hex digits = 60 bits, always non-negative
  }

  /** Column wrapper used by [[graft.ops.Hashing.h60]]. */
  def h60(c: Column): Column = Bridge.column(Hash60(Bridge.expression(c)))
}
