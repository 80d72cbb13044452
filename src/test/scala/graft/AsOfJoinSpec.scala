package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoinOps

/** The native as-of operator must agree exactly with the join+rank
  * formulation (rel_asof_join) on real data, handle empty right sides,
  * and produce nulls for unmatched left rows.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"))

  private def clicks = Tables.events(spark, sf)
    .filter(col("event_type") === "click")
    .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))

  test("native as-of join equals the window-based formulation") {
    val native = AsOfJoinOps.asofJoin(purchases, clicks,
        "p_user", "c_user", "purchase_ts", "click_ts",
        rightTieCols = Seq("click_id"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
      .orderBy("purchase_id")
      .collect().map(_.toSeq).toSeq

    val windowed = graft.operators.RelationalQueries.asofJoin(spark, sf)
      .collect().map(_.toSeq).toSeq

    assert(native.nonEmpty)
    assert(native == windowed)
  }

  test("unmatched left rows carry nulls, empty right side works") {
    val emptyRight = clicks.filter(lit(false))
    val out = AsOfJoinOps.asofJoin(purchases, emptyRight,
        "p_user", "c_user", "purchase_ts", "click_ts")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("click_id"))))
  }

  test("null right times are skipped, not a merge barrier") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L))
      .toDF("p_user", "purchase_ts", "purchase_id")
    // null-ts row sorts FIRST in its key group; it must be discarded so
    // the real match behind it stays reachable
    val right = Seq((1L, Option.empty[Long], 90L), (1L, Some(50L), 91L))
      .toDF("c_user", "click_ts", "click_id")
    val out = AsOfJoinOps.asofJoin(left, right,
        "p_user", "c_user", "purchase_ts", "click_ts")
      .orderBy("purchase_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(out.head.fieldIndex("click_id")) == 91L))
  }

  test("string join keys are stable across buffered rows") {
    import spark.implicits._
    val left = (1 to 500).map(i => (s"user_${i % 50}", i.toLong * 10, i.toLong))
      .toDF("p_user", "purchase_ts", "purchase_id")
    val right = (1 to 500).map(i => (s"user_${i % 50}", i.toLong * 10 - 5, i.toLong + 1000))
      .toDF("c_user", "click_ts", "click_id")
    val native = AsOfJoinOps.asofJoin(left, right,
        "p_user", "c_user", "purchase_ts", "click_ts",
        rightTieCols = Seq("click_id"))
      .select("purchase_id", "click_id").orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // expected: for purchase i (ts 10i), last click of same user with
    // ts < 10i is click i (ts 10i-5)
    val expected = (1 to 500).map(i => (i.toLong, i.toLong + 1000))
    assert(native == expected)
  }

  test("physical plan co-partitions and sorts both sides") {
    val df = AsOfJoinOps.asofJoin(purchases, clicks,
      "p_user", "c_user", "purchase_ts", "click_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("\\bSort\\b".r.findAllIn(plan).size >= 2, plan)
  }
}
