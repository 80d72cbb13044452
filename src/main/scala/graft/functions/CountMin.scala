package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed UDAF (SURVEY.md §2 B32; the charter's
  * "novel sketch" custom-operator path) — sublinear frequency
  * estimation for heavy-hitter detection over a term stream.
  *
  * Scale properties that make this the 100 TB shape:
  *   - the buffer is a FIXED `depth × width` array of longs (8 KiB at
  *     4×256) regardless of corpus size — per-partition partial
  *     sketches merge by elementwise sum, so the shuffle moves one
  *     sketch per partition, never the terms;
  *   - merge is commutative/associative ⇒ the result is bit-identical
  *     at any parallelism (unlike float aggregation, every cell is an
  *     integer sum);
  *   - estimates are deterministic: the row hashes are affine
  *     permutations of one md5-derived 60-bit term hash (the same
  *     one-hash trick the MinHash signatures use, TextQueries.scala),
  *     not seeded randomness.
  *
  * Guarantees (Cormode & Muthukrishnan 2005): `est ≥ true` always, and
  * `est ≤ true + εN` with probability `1 − δ` for `ε = e/width`,
  * `δ = e^-depth`.
  */
object CountMin {

  val Depth = 4
  val Width = 256

  /** 2^31-1 (Mersenne, the MinHash permutation modulus): reducing the
    * 60-bit hash mod P FIRST keeps the affine product under 2^56 — a
    * full-width multiply against the raw hash would overflow Long.
    */
  private val P = 2147483647L

  private val RowA = Array(976369L, 1299709L, 15485863L, 32452843L)
  private val RowB = Array(17L, 9176L, 777777L, 123456791L)

  /** The same cross-engine 60-bit hash the SQL operators use
    * (`conv(substr(md5(x),1,15),16,10)`), computed host-side.
    */
  def hash60(term: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(term.getBytes(StandardCharsets.UTF_8))
    // first 15 hex digits = high 60 bits of the digest
    var h = 0L
    var i = 0
    while (i < 8) {
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    h >>> 4 // 64 bits read, keep the leading 60
  }

  /** Column index of `term` in sketch row `row` (point form of
    * [[buckets]] — single source of truth for the hashing).
    */
  def bucket(row: Int, term: String): Int = buckets(term)(row)

  /** Buckets for one term across all rows — one md5 per term, reused
    * by every row's affine permutation (the one-hash minhash trick).
    */
  private[functions] def buckets(term: String): Array[Int] = {
    val h = hash60(term) % P
    val out = new Array[Int](Depth)
    var r = 0
    while (r < Depth) {
      out(r) = ((RowA(r) * h + RowB(r)) % P % Width).toInt
      r += 1
    }
    out
  }

  /** Declarative (whole-stage-codegen) form of [[estimate]]: the same
    * affine-permutation arithmetic as [[buckets]], built on the native
    * `md5_top60` expression + integer ops + `element_at`/`least` — no
    * Scala UDF, so a verification pass over the sketch stays inside
    * codegen. Bit-identical to the host-side form (the affine product
    * stays under 2^56, see [[P]]); pinned against [[estimate]] in
    * CountMinSpec. Requires the graft extensions (md5_top60) on the
    * session.
    */
  def estimateCol(sketch: org.apache.spark.sql.Column,
      term: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, element_at, least, lit}
    val h = call_function("md5_top60", term) % P
    val cells = (0 until Depth).map { r =>
      element_at(sketch,
        ((h * RowA(r) + RowB(r)) % P % Width + lit(1 + r * Width)).cast("int"))
    }
    least(cells: _*)
  }

  /** Point estimate: min over rows of the addressed counter. */
  def estimate(sketch: Array[Long], term: String): Long = {
    val bs = buckets(term)
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = sketch(r * Width + bs(r))
      if (c < est) est = c
      r += 1
    }
    est
  }

  /** The aggregator: feed it the term column of an exploded corpus;
    * it returns the flattened `Depth × Width` counter array.
    */
  object Agg extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)
    override def reduce(b: Array[Long], term: String): Array[Long] = {
      val bs = buckets(term)
      var r = 0
      while (r < Depth) {
        b(r * Width + bs(r)) += 1L
        r += 1
      }
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def finish(r: Array[Long]): Array[Long] = r
    // native array<bigint> encoding — partial sketches cross the
    // shuffle as Tungsten arrays, not java-serialized blobs
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
