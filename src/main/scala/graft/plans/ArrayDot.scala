package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product of two float/double arrays as ONE codegen'd loop.
  *
  * The unfused form — 64 `element_at(...) * element_at(...)` terms
  * reduced with `+` — inlines ~500 Java expressions per dot product;
  * with several dots in one stage (LSH bucket = 8 plane projections +
  * norm + cosine) the generated `processNext()` crosses janino's 64 KB
  * method limit and the whole stage silently falls back to interpreted
  * mode — the hottest path in the engine running slow at exactly the
  * scale where it matters. The loop form generates O(1) code per dot
  * regardless of dimension.
  *
  * Summation is the same left-associated IEEE-754 order as the unfused
  * `.reduce(_ + _)` term tree and the oracle's explicit `a[1]*b[1] +
  * ... + a[64]*b[64]`, so results are bit-identical and hash-stable.
  * A null array, or any null element, yields null (matching the
  * null-propagation of the term tree). Mismatched array lengths RAISE
  * at runtime — the unfused ANSI `element_at` form failed fast out of
  * bounds on dimension drift, and a silent min-length dot would quietly
  * diverge from the fixed-dim oracle.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (la.numElements() != ra.numElements())
      throw new IllegalArgumentException(
        s"array_dot: dimension mismatch (${la.numElements()} vs ${ra.numElements()})")
    val n = la.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val a = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val b = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      sum += a * b
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, e: Expression, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($l.numElements() != $r.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_dot: dimension mismatch (" + $l.numElements() + " vs " + $r.numElements() + ")");
         |}
         |int $n = $l.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += ${get(l, left, i)} * ${get(r, right, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
