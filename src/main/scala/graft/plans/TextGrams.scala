package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled n-gram builders backing the native expressions below.
  *
  * The declarative forms — `transform(sequence(1, len-n+1), i ->
  * substring(text, i, n))` (+ `array_distinct`) and the word-shingle
  * equivalent — are higher-order functions, which Catalyst evaluates
  * interpreted, one lambda-tree walk per element. On the dedup corpus
  * that put ~4 s of pure expression interpretation in front of every
  * consumer (the round-2 `dedup_ngram_jaccard` hot spot). These helpers
  * are ordinary compiled JVM loops invoked from generated code, so gram
  * construction rides inside whole-stage codegen at full speed.
  *
  * Semantics are pinned to the declarative forms they replace (and to
  * the DuckDB oracles): SQL substring (character-based, 1-indexed,
  * truncated at the end), at least one gram even for short strings,
  * split on single spaces keeping empties, first-occurrence order for
  * the distinct variants.
  */
object NGramUtil {

  /** Character n-grams of `text`: positions 1..max(len-n+1, 1). */
  def charNGrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val count = math.max(text.numChars() - n + 1, 1)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 1
      while (i <= count) { seen.add(text.substringSQL(i, n)); i += 1 }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    } else {
      val arr = new Array[Any](count)
      var i = 0
      while (i < count) { arr(i) = text.substringSQL(i + 1, n); i += 1 }
      new GenericArrayData(arr)
    }
  }

  /** Word k-gram shingles of space-separated `text` (tokens joined back
    * with single spaces); empty array when there are fewer than k
    * tokens — the same contract as the declarative shingle builder.
    */
  def wordShingles(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val count = toks.length - k + 1
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String](count * 2)
      else new java.util.ArrayList[UTF8String](count)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

private[plans] trait GramExpression extends UnaryExpression {
  def n: Int
  def distinct: Boolean

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  protected def helperCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NGramUtil.$helperCall($c, $n, $distinct)")
}

/** `char_ngrams(text, n, distinct)` — see [[NGramUtil.charNGrams]]. */
case class CharNGrams(child: Expression, n: Int, distinct: Boolean)
    extends GramExpression {
  override def prettyName: String = "char_ngrams"
  override protected def helperCall: String = "charNGrams"
  override protected def nullSafeEval(s: Any): Any =
    NGramUtil.charNGrams(s.asInstanceOf[UTF8String], n, distinct)
  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

/** `word_shingles(text, k, distinct)` — see [[NGramUtil.wordShingles]]. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends GramExpression {
  override def prettyName: String = "word_shingles"
  override protected def helperCall: String = "wordShingles"
  override protected def nullSafeEval(s: Any): Any =
    NGramUtil.wordShingles(s.asInstanceOf[UTF8String], n, distinct)
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
