package graft.plans

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, LongType}

/** Element-wise sum of ARRAY<BIGINT> with int128 accumulation, emitted
  * as ARRAY<DECIMAL(38,0)> — [[ArraySumAgg]]'s wide twin for sums that
  * legitimately exceed int64 (the covariance audit's micro² pair sums:
  * int64 caps out near 2.7×10⁷ rows on this corpus; a 100 TB corpus is
  * ~10¹² rows × ≤1.6×10¹³ per-row product ≈ 10²⁵, comfortably inside
  * DECIMAL(38,0) and int128).
  *
  * The buffer is two longs per element (hi, lo — a two's-complement
  * int128), packed in one Array[Long] of length 2·dim, so the hot
  * per-row update is branch-free integer carry arithmetic — no
  * BigInteger allocation until the one eval per group. int128 itself
  * cannot overflow here (it would take ~2⁶³ max-magnitude int64
  * inputs); the eval converts exactly and REFUSES loudly if the total
  * somehow exceeds DECIMAL(38,0)'s ±(10³⁸−1) envelope rather than
  * emitting a wrong number.
  *
  * Null/dimension semantics match [[ArraySumAgg]]: null arrays and
  * elements contribute nothing, an all-null group yields NULL, and the
  * element count locks to the first array seen.
  */
case class ArraySumAggDec(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum_agg_dec expects ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "array_sum_agg_dec"

  // buffer layout: [hi_0, lo_0, hi_1, lo_1, …] — interleaved so one
  // element's halves share a cache line in the update loop
  override def createAggregationBuffer(): Array[Long] = null

  /** b[2i], b[2i+1] += sign-extended x (int128 += int64). */
  private def addSigned64(b: Array[Long], i: Int, x: Long): Unit = {
    val lo = b(2 * i + 1)
    val newLo = lo + x
    // unsigned carry out of the low-word addition
    val carry = ((lo & x) | ((lo | x) & ~newLo)) >>> 63
    b(2 * i + 1) = newLo
    b(2 * i) = b(2 * i) + (x >> 63) + carry
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b =
      if (buffer == null) new Array[Long](2 * n)
      else if (buffer.length != 2 * n) throw new IllegalArgumentException(
        s"array_sum_agg_dec: dimension mismatch (${buffer.length / 2} vs $n)")
      else buffer
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) addSigned64(b, i, arr.getLong(i))
      i += 1
    }
    b
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other == null) return buffer
    if (buffer == null) return other
    if (buffer.length != other.length) throw new IllegalArgumentException(
      s"array_sum_agg_dec: dimension mismatch " +
        s"(${buffer.length / 2} vs ${other.length / 2})")
    var i = 0
    while (i < buffer.length) {
      val aLo = buffer(i + 1)
      val bLo = other(i + 1)
      val newLo = aLo + bLo
      val carry = ((aLo & bLo) | ((aLo | bLo) & ~newLo)) >>> 63
      buffer(i + 1) = newLo
      buffer(i) = buffer(i) + other(i) + carry
      i += 2
    }
    buffer
  }

  private val DecimalMax = BigInteger.TEN.pow(38).subtract(BigInteger.ONE)

  override def eval(buffer: Array[Long]): Any = {
    if (buffer == null) return null
    val n = buffer.length / 2
    val out = new Array[Any](n)
    val bytes = new Array[Byte](16)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) {
      bb.clear()
      bb.putLong(buffer(2 * i))
      bb.putLong(buffer(2 * i + 1))
      // big-endian two's complement — BigInteger's native signed form
      val bi = new BigInteger(bytes)
      if (bi.abs.compareTo(DecimalMax) > 0) throw new ArithmeticException(
        s"array_sum_agg_dec: element $i total $bi exceeds DECIMAL(38,0)")
      out(i) = Decimal(new java.math.BigDecimal(bi), 38, 0)
      i += 1
    }
    new GenericArrayData(out)
  }

  // Wire format matches [[ArraySumAgg]]: empty = null buffer; otherwise
  // one tag byte then the (hi, lo) longs, so a length-0 buffer (group of
  // zero-length arrays) round-trips as an empty array instead of
  // collapsing to NULL across a shuffle.
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAggDec =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAggDec =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArraySumAggDec =
    copy(child = newChild)
}
