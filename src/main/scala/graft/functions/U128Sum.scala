package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2 B32, §7.4): exact sum over u128-scale
  * decimal-string columns — the full-range analog of the reference's
  * balance fields (`debits_posted` etc., reference message.go:56-68),
  * which exceed Decimal(38,0) by one digit at u128 max.
  *
  * Buffer is an unbounded BigInt carried as a byte array (two's
  * complement), so partial aggregation / merge works across any
  * partitioning with no precision cliff; the result is the canonical
  * decimal string (the engine's u128 wire form).
  */
object U128Sum extends Aggregator[String, Array[Byte], String] {
  override def zero: Array[Byte] = BigInt(0).toByteArray
  override def reduce(b: Array[Byte], a: String): Array[Byte] =
    (BigInt(b) + BigInt(a)).toByteArray
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    (BigInt(b1) + BigInt(b2)).toByteArray
  override def finish(r: Array[Byte]): String = BigInt(r).toString
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
