package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection COUNT of two SORTED-ascending distinct ARRAY<BIGINT>
  * columns as one codegen'd merge scan.
  *
  * The pair-verification hot path of every near-dup operator scored
  * `size(array_intersect(ghs_a, ghs_b))`: per candidate pair that
  * builds a hash set over one array, probes it with the other, and
  * MATERIALIZES the intersection array — only for `size` to throw the
  * elements away. With tens of thousands of candidate pairs ×
  * ~10³-element per-doc gram sets, the per-pair allocation + hashing
  * is the dominant verify cost. This expression walks both arrays with
  * two pointers and counts equal elements — no set, no allocation,
  * O(na + nb) — inside whole-stage codegen.
  *
  * INPUT CONTRACT: both arrays must be sorted ascending with distinct
  * elements — exactly what `sort_array(collect_set(...))` produces
  * (the staging aggregations are the only producers). On that domain
  * the count equals `size(array_intersect(a, b))` exactly: both count
  * each common VALUE once. collect_set never emits null elements, so
  * element-null handling never fires (a defensive isNullAt skip keeps
  * the scan total rather than undefined if the contract is ever
  * violated with nulls, which sort_array places first). A null ARRAY
  * on either side yields null, matching array_intersect.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects ARRAY<BIGINT> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val na = la.numElements()
    val nb = ra.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (la.isNullAt(i)) i += 1
      else if (ra.isNullAt(j)) j += 1
      else {
        val a = la.getLong(i)
        val b = ra.getLong(j)
        if (a == b) { c += 1; i += 1; j += 1 }
        else if (a < b) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      s"""
         |int $na = $l.numElements();
         |int $nb = $r.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($l.isNullAt($i)) { $i++; }
         |  else if ($r.isNullAt($j)) { $j++; }
         |  else {
         |    long $a = $l.getLong($i);
         |    long $b = $r.getLong($j);
         |    if ($a == $b) { $c++; $i++; $j++; }
         |    else if ($a < $b) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
