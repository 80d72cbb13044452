package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Upper-triangle outer product of a BIGINT vector as ONE codegen'd
  * loop: for input v of length n, emits the n(n+1)/2-element array
  * [v(i)·v(j) | 1 ≤ i ≤ j ≤ n] in row-major triangle order — the
  * per-row contribution of the covariance/Gram aggregate
  * (vec_covariance), whose higher-order-function form evaluates 2080
  * interpreted lambda calls per row (the semanticAssigned lesson:
  * per-element lambda interpretation dominates exactly the loops that
  * matter at scale).
  *
  * Products use Math.multiplyExact, so micro-unit overflow THROWS
  * loudly (matching the ANSI behavior of the `v[i] * v[j]` lambda form
  * it replaces) instead of wrapping into a silently wrong covariance.
  * A null array or any null element yields null.
  */
case class ArrayOuterTri(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_outer_tri expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "array_outer_tri"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](n * (n + 1) / 2)
    var p = 0
    i = 0
    while (i < n) {
      val vi = a.getLong(i)
      var j = i
      while (j < n) {
        out(p) = Math.multiplyExact(vi, a.getLong(j))
        p += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val vi = ctx.freshName("vi")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n * ($n + 1) / 2];
         |int $p = 0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $vi = $a.getLong($i);
         |  for (int $j = $i; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $out[$p++] = java.lang.Math.multiplyExact($vi, $a.getLong($j));
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayOuterTri =
    copy(child = newChild)
}
