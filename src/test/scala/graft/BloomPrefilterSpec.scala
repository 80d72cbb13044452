package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQueries

/** dedup_bloom_prefilter: the bloom prefilter must be invisible in the
  * RESULT (exactly the anti-join's answer — blooms have no false
  * negatives) and load-bearing in the PLAN (one bloom build shared by
  * every probe, broadcast-only joins, corpus side never shuffled).
  */
class BloomPrefilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom prefilter returns exactly the exact anti-join answer") {
    val got = TextQueries.bloomPrefilter(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      .select(md5(col("text")).as("ch"))
    val expected = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus, col("h") === col("ch"), "left_anti")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("one shared bloom build; broadcast joins only; no corpus shuffle") {
    val df = TextQueries.bloomPrefilter(spark, sf)
    val formatted = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // every probe (and the inferred corpus-side pushdowns) must host
    // THE SAME scalar subquery — textually-identical subqueries
    // canonicalize to one shared bloom build
    val subqueryIds = "Subquery subquery#(\\d+)".r
      .findAllMatchIn(formatted).map(_.group(1)).toSet
    assert(subqueryIds.size == 1, formatted)
    // and that one build merges partial blooms executor-side
    assert(formatted.contains("partial_bloom_filter_agg"), formatted)
    assert(formatted.contains("might_contain"), formatted)
    // both verification joins broadcast the slim candidate/confirmed
    // sides; a sort-merge join would mean the corpus shuffled
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
