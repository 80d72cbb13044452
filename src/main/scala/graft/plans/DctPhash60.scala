package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real DCT perceptual hash over the deterministic stub decode — the
  * round-11 surrogate (`md5_top60` + an artificial single-bit flip)
  * replaced by an actual transform so the fingerprint's Hamming
  * structure comes from pixel-space perturbation, not from a scripted
  * flip (reference context: the media near-dup pipeline stubs codec
  * I/O; SURVEY.md §multimodal).
  *
  * Pipeline, all exact integer math (cross-engine deterministic — the
  * DuckDB oracle interpolates THIS object's cosine table as literals,
  * so there is no runtime cosine anywhere):
  *
  *   1. Stub decode: a 16×16 grayscale "image" whose bytes are the
  *      iterated-MD5 stream of the source text (`md5(text:block)`,
  *      16 blocks × 16 bytes, row-major). Re-encode noise for the
  *      non-canonical variants (variant ≠ 0): per-pixel jitter in
  *      [-2, 2] from a salted stream (`md5(text#variant:block)`),
  *      clamped to [0, 255] — small pixel-space perturbation, exactly
  *      what a lossy re-encode does.
  *   2. 2D DCT-II via the separable form (T = C·P, then coef = T·Cᵀ)
  *      with the cosine basis in 2^14 fixed point: every product and
  *      sum is a Long, max |coef| < 2^45.
  *   3. Fingerprint: the 60 lowest-frequency AC coefficients (row-major
  *      (u,v) indices 1..60 of the 8×8 low-frequency block, DC
  *      dropped), thresholded at their lower median — bit k set iff
  *      coef_k > median. 60 bits keeps the Manku banding constants
  *      (3 bands × 20 bits, radius 2) unchanged.
  *
  * Bits now flip only where a coefficient sits near the median, so
  * variant copies land at small-but-variable Hamming distance — real
  * bit correlation, measured in SCALING.md §media pHash.
  */
object DctHashUtil {
  val Dim = 16
  val Freq = 8
  val FixedPointScale = 16384 // 2^14

  /** C(u)(x) = round(cos(π·(2x+1)·u / 32) · 2^14), u < 8, x < 16. */
  val C: Array[Array[Long]] = Array.tabulate(Freq, Dim) { (u, x) =>
    Math.round(math.cos(math.Pi * (2 * x + 1) * u / (2 * Dim)) *
      FixedPointScale)
  }

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def digest(s: String): Array[Byte] =
    md.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The 256-byte stub pixel stream (+ variant jitter). */
  private[graft] def pixels(text: String, variant: Long): Array[Int] = {
    val px = new Array[Int](Dim * Dim)
    var b = 0
    while (b < Dim) {
      val d = digest(s"$text:$b")
      val nd = if (variant == 0L) null else digest(s"$text#$variant:$b")
      var j = 0
      while (j < Dim) {
        val raw = d(j) & 0xff
        px(b * Dim + j) =
          if (nd == null) raw
          else math.min(255, math.max(0, raw + ((nd(j) & 0xff) % 5) - 2))
        j += 1
      }
      b += 1
    }
    px
  }

  def hash(text: UTF8String, variant: Long): Long = {
    val p = pixels(text.toString, variant)
    // T(u)(c) = Σ_r p(r)(c) · C(u)(r)
    val t = Array.ofDim[Long](Freq, Dim)
    var u = 0
    while (u < Freq) {
      var c = 0
      while (c < Dim) {
        var s = 0L
        var r = 0
        while (r < Dim) { s += p(r * Dim + c) * C(u)(r); r += 1 }
        t(u)(c) = s
        c += 1
      }
      u += 1
    }
    // coef k (1-based row-major index in the 8×8 block, DC skipped)
    val coefs = new Array[Long](60)
    var k = 1
    while (k <= 60) {
      val cu = k / Freq
      val cv = k % Freq
      var s = 0L
      var c = 0
      while (c < Dim) { s += t(cu)(c) * C(cv)(c); c += 1 }
      coefs(k - 1) = s
      k += 1
    }
    val sorted = coefs.clone()
    java.util.Arrays.sort(sorted)
    val m = sorted(29) // lower median of 60
    var h = 0L
    var i = 0
    while (i < 60) { if (coefs(i) > m) h |= 1L << i; i += 1 }
    h
  }
}

/** `dct_phash60(text, variant)` — see [[DctHashUtil.hash]]. */
case class DctPhash60(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dct_phash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dct_phash60 expects (STRING, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(t: Any, v: Any): Any =
    DctHashUtil.hash(t.asInstanceOf[UTF8String], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) => s"graft.plans.DctHashUtil.hash($t, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DctPhash60 =
    copy(left = newLeft, right = newRight)
}
