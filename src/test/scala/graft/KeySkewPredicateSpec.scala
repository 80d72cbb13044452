package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalQueries

/** The key-skew hot-key predicate must stay exact at cluster
  * magnitudes: at ~1e12 rows × ~1e9 keys the cross-multiplication
  * passes 2⁶³, where a BIGINT product wraps silently with ANSI off.
  * The decimal(38,0) form must classify correctly anyway.
  */
class KeySkewPredicateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("cnt", LongType),
    StructField("n_keys", LongType),
    StructField("n_rows", LongType)))

  test("hot-key cross-multiplication is exact past 2^63") {
    import scala.jdk.CollectionConverters._
    val nKeys = 1000000000L      // 1e9 keys
    val nRows = 1000000000000L   // 1e12 rows → mean 1000, hot ⟺ cnt > 2000
    val rows = Seq(
      Row(10000000000L, nKeys, nRows), // 1e10-row mega-key: product 1e19 > 2^63
      Row(2001L, nKeys, nRows),        // just over 2× mean → hot
      Row(2000L, nKeys, nRows),        // exactly 2× mean → not hot
      Row(1999L, nKeys, nRows))        // under → not hot
    val df = spark.createDataFrame(rows.asJava, schema)

    val hot = df.filter(RelationalQueries.hotKeyPred)
      .select("cnt").collect().map(_.getLong(0)).sorted.toSeq
    assert(hot == Seq(2001L, 10000000000L), s"got $hot")

    // prove the test bites: the plain Long product passes 2^63 for the
    // mega-key — with ANSI on (Spark 4 default) the query ABORTS with
    // an arithmetic overflow, with ANSI off it wraps negative and
    // silently drops the key; either way the un-cast form is broken
    val longForm = scala.util.Try(df
      .filter(col("cnt") * col("n_keys") > col("n_rows") * 2)
      .select("cnt").collect().map(_.getLong(0)).sorted.toSeq)
    assert(longForm.isFailure || !longForm.get.contains(10000000000L),
      "Long math unexpectedly survived 1e19 — update this spec")
  }
}
