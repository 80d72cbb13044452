package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Direct-from-digest form of the engine's cross-engine 60-bit hash.
  *
  * The declarative form — `conv(substring(md5(x), 1, 15), 16, 10)
  * ::long` — computes the 16-byte digest, hex-encodes it to a 32-char
  * string, substrings 15 chars, and parses them back base-16: three
  * string round-trips whose cost rivals the digest itself, multiplied
  * by every shingle/gram/token in the dedup pipelines (millions of
  * evaluations per corpus pass — the measured hot spot of the MinHash
  * family). This expression takes the SAME top 60 bits straight off
  * the digest bytes: first 8 bytes big-endian, shifted right 4 —
  * bit-identical to the conv/substring form for every input, so the
  * DuckDB oracles (`('0x' || substr(md5(x),1,15))::BIGINT`) are
  * unchanged. Equality with the declarative form is property-tested in
  * HashExprSpec.
  */
object HashUtil {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def md5Top60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** `md5_top60(text)` — see [[HashUtil.md5Top60]]. */
case class Md5Top60(child: Expression) extends UnaryExpression {
  override def prettyName: String = "md5_top60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_top60 expects a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(s: Any): Any =
    HashUtil.md5Top60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashUtil.md5Top60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Top60 =
    copy(child = newChild)
}
