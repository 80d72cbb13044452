package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the portable-number rule (reference
  * message.go:12,18-24,34-41): a non-negative integer renders as bare
  * digits iff <= 2^53-1, else as a quoted decimal string. These are the
  * codegen'd (`doGenCode`) equivalents of the `when/concat` column trees
  * in CdcFunctions — one virtual call fewer per row and a single tight
  * branch in generated Java, demonstrating the custom-Expression
  * extension path (SURVEY.md §7.3).
  */
case class PortableU64Json(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_u64_json expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "portable_u64_json"

  // note: bare iff <= 2^53-1 with NO lower-bound check, matching the
  // when/concat column form and the oracle CASE exactly (inputs are
  // unsigned by contract; a negative long renders bare either way)
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v <= PortableJson.MaxSafe) UTF8String.fromString(v.toString)
    else UTF8String.fromString("\"" + v + "\"")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v <= ${PortableJson.MaxSafe}L) {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.lang.Long.toString($v));
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    "\\"" + java.lang.Long.toString($v) + "\\"");
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PortableU64Json =
    copy(child = newChild)
}

/** u128 variant over the canonical decimal-string representation; the
  * magnitude test is by digit-string length (16-digit boundary), so no
  * 128-bit arithmetic is needed.
  */
case class PortableU128Json(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_u128_json expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "portable_u128_json"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (PortableJson.u128IsSafe(s.toString)) s
    else UTF8String.concat(PortableJson.Quote, s, PortableJson.Quote)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |if (graft.plans.PortableJson.u128IsSafe($s.toString())) {
         |  ${ev.value} = $s;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.concat(
         |    graft.plans.PortableJson.Quote, $s, graft.plans.PortableJson.Quote);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PortableU128Json =
    copy(child = newChild)
}

object PortableJson {
  val MaxSafe: Long = 9007199254740991L
  private val MaxSafeStr = "9007199254740991"
  val Quote: UTF8String = UTF8String.fromString("\"")

  /** Callable from generated code: bare iff numerically <= 2^53-1,
    * decided by digit-string comparison (no big-int math).
    */
  def u128IsSafe(s: String): Boolean =
    s.length < 16 || (s.length == 16 && s.compareTo(MaxSafeStr) <= 0)
}
