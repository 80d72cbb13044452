package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of ARRAY<BIGINT> columns as ONE mergeable aggregate
  * buffer — the centroid-accumulation primitive.
  *
  * The alternative (posexplode → (key, dim)-grouped scalar sums)
  * inflates the corpus rowcount by the embedding dimension (64×) before
  * the partial aggregate ever sees it; at 100 TB that explode is pure
  * CPU burn. This aggregate folds each array into a single long[dim]
  * buffer per group per partition — the map side emits |groups| array
  * rows, the merge is an element-wise add, and the integer math keeps
  * the result exact and shuffle-order-independent (the reason the
  * centroid queries aggregate QUANTIZED codes, not floats).
  *
  * Null arrays and null elements contribute nothing (SQL sum
  * semantics); an all-null group yields NULL. The buffer length locks
  * to the first array seen — a later length mismatch raises, matching
  * the fixed-dimension contract of the vector corpus (and array_dot's
  * dimension-drift check).
  *
  * Sums accumulate through `Math.addExact` in BOTH update and merge:
  * a silent int64 wraparound here would be a silently-wrong centroid
  * (the first cut's plain `+=` wrapped — exactly the failure mode the
  * exact-integer design exists to prevent). Callers whose sums can
  * legitimately exceed int64 (covariance pair sums at corpus scale)
  * use [[ArraySumAggDec]], the int128/DECIMAL(38,0) twin.
  */
case class ArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum_agg expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "array_sum_agg"

  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b =
      if (buffer == null) new Array[Long](n)
      else if (buffer.length != n) throw new IllegalArgumentException(
        s"array_sum_agg: dimension mismatch (${buffer.length} vs $n)")
      else buffer
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) b(i) = Math.addExact(b(i), arr.getLong(i))
      i += 1
    }
    b
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other == null) return buffer
    if (buffer == null) return other
    if (buffer.length != other.length) throw new IllegalArgumentException(
      s"array_sum_agg: dimension mismatch (${buffer.length} vs ${other.length})")
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // Wire format: empty = the null (nothing-seen) buffer; otherwise one
  // tag byte then the longs. The tag keeps a LENGTH-0 buffer (a group
  // whose inputs are all zero-length arrays) distinct from null — a
  // bare empty-bytes encoding would turn that group's empty-array
  // result into NULL, but only on plans that shuffle the partial
  // buffer (map-side-combine vs single-partition divergence).
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(1 + 8 * buffer.length)
    bb.put(1: Byte)
    buffer.foreach(bb.putLong(_): Unit)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    Array.fill((bytes.length - 1) / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArraySumAgg =
    copy(child = newChild)
}
