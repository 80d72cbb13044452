package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Driver-built two-level coarse-quantizer index, shipped to executors
  * as a plan reference object (one copy per executor, like a broadcast
  * literal): the super layer's ids/embeddings plus, per super, its
  * fine-centroid cell (ids + embeddings). Bounded by construction —
  * k ≤ 4096 centroids × 64 doubles ≈ 2 MB, cells ≤ (replicas×k + ksup)
  * entries.
  */
final class SemIndex(
    val supIds: Array[Long],
    val supEmb: Array[Array[Double]],
    val cellIds: Array[Array[Long]],
    val cellEmb: Array[Array[Array[Double]]],
    val probes: Int) extends Serializable

object SemanticAssignUtil {

  /** HALF_UP 6-decimal rounding — the exact rule Spark's `round(x, 6)`
    * and DuckDB's `round(x, 6)` apply, so this compiled path is
    * bit-compatible with the declarative form and the oracle.
    */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Left-associated IEEE dot of the row's float embedding against a
    * double centroid — the same summation order as [[ArrayDot]].
    */
  private def dot(emb: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += emb.getFloat(i).toDouble * c(i); i += 1 }
    s
  }

  /** The full hierarchical argmax for one vector: rank supers by
    * (round-6 dot DESC, sid ASC), then max (round-6 dot DESC, cid ASC)
    * over the top-`probes` cells. Identical pick to the oracle's
    * rank-1 window chain; duplicate cell entries (a centroid reachable
    * through two probed supers) are harmless under max.
    */
  def assign(emb: ArrayData, idx: SemIndex): Long = {
    val ns = idx.supIds.length
    val p = math.min(idx.probes, ns)
    // top-P selection over ≤64 supers: insertion into fixed arrays
    val topD = new Array[Double](p)
    val topI = new Array[Int](p)
    var filled = 0
    var s = 0
    while (s < ns) {
      val d = r6(dot(emb, idx.supEmb(s)))
      // supers iterate in ascending sid, so on ties the EARLIER
      // (lower-sid) entry must win: strict > displaces, == keeps
      var pos = filled
      while (pos > 0 && d > topD(pos - 1)) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var j = last
        while (j > pos) { topD(j) = topD(j - 1); topI(j) = topI(j - 1); j -= 1 }
        topD(pos) = d
        topI(pos) = s
        if (filled < p) filled += 1
      }
      s += 1
    }
    var bestD = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var t = 0
    while (t < filled) {
      val sup = topI(t)
      val ids = idx.cellIds(sup)
      val embs = idx.cellEmb(sup)
      var j = 0
      while (j < ids.length) {
        val d = r6(dot(emb, embs(j)))
        if (d > bestD || (d == bestD && ids(j) < bestCid)) {
          bestD = d
          bestCid = ids(j)
        }
        j += 1
      }
      t += 1
    }
    bestCid
  }
}

/** `semantic_assign(embedding)` over a driver-built [[SemIndex]] — the
  * hierarchical quantizer's per-row assignment as a compiled native
  * expression. The first cut composed this from higher-order array
  * functions (transform/array_sort/flatten/array_max); semantically
  * identical, but lambda evaluation is interpreted per element and the
  * pass ran 3.6× slower than the flat quantizer at the 20k decade even
  * with the same dot count. This expression is the same zero-exchange
  * map-side pass with the inner loops compiled.
  */
case class SemanticAssign(child: Expression, index: SemIndex)
    extends UnaryExpression {
  override def prettyName: String = "semantic_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      "semantic_assign reads the raw FLOAT embedding column; cast-free " +
        "float input keeps the scan narrow — project the float column")
    case t => TypeCheckResult.TypeCheckFailure(
      s"semantic_assign expects ARRAY<FLOAT>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    SemanticAssignUtil.assign(a.asInstanceOf[ArrayData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("semIndex", index,
      classOf[SemIndex].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SemanticAssignUtil.assign($c, $idxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SemanticAssign =
    copy(child = newChild)
}

/** Flat probe-cell index for ANN serving: the trained centroid table
  * held as a driver-built plan reference object, cids ASCENDING (the
  * tie-break order). ≤4096 × 64 doubles ≈ 2 MB — ships with the task
  * binary once per stage instead of riding a broadcast exchange + a
  * per-query ranking window through every serving micro-batch.
  */
final class ProbeIndex(
    val cids: Array[Long],
    val emb: Array[Array[Double]],
    val nprobe: Int) extends Serializable

object SemanticProbeCellsUtil {

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-`nprobe` cell ids for one DOUBLE query embedding, ranked by
    * (round-6 dot DESC, cid ASC) — the exact pick the previous
    * crossJoin(broadcast(cents)) + row_number window made, now one
    * compiled map-side pass (AnnStreamSpec's recall pin is unchanged).
    */
  def probeCells(q: ArrayData, idx: ProbeIndex): ArrayData = {
    val n = idx.cids.length
    val p = math.min(idx.nprobe, n)
    val topD = new Array[Double](p)
    val topI = new Array[Int](p)
    var filled = 0
    var i = 0
    while (i < n) {
      val c = idx.emb(i)
      var s = 0.0
      var j = 0
      while (j < c.length) { s += q.getDouble(j) * c(j); j += 1 }
      val d = r6(s)
      // cells iterate in ascending cid, so on ties the EARLIER
      // (lower-cid) entry must win: strict > displaces, == keeps
      var pos = filled
      while (pos > 0 && d > topD(pos - 1)) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var k = last
        while (k > pos) { topD(k) = topD(k - 1); topI(k) = topI(k - 1); k -= 1 }
        topD(pos) = d
        topI(pos) = i
        if (filled < p) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var t = 0
    while (t < filled) { out(t) = idx.cids(topI(t)); t += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `semantic_probe_cells(q_embedding)` — the serving-side probe
  * selection as a compiled native expression over a [[ProbeIndex]].
  * Returns the query's top-`nprobe` cell ids; explode + join confines
  * the corpus scan to those cells with NO per-batch centroid broadcast
  * and NO per-query ranking window (the r17 ann_serve fixed cost).
  */
case class SemanticProbeCells(child: Expression, index: ProbeIndex)
    extends UnaryExpression {
  override def prettyName: String = "semantic_probe_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"semantic_probe_cells expects the ARRAY<DOUBLE> query embedding, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    SemanticProbeCellsUtil.probeCells(a.asInstanceOf[ArrayData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("probeIndex", index,
      classOf[ProbeIndex].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.plans.SemanticProbeCellsUtil.probeCells($c, $idxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SemanticProbeCells =
    copy(child = newChild)
}
