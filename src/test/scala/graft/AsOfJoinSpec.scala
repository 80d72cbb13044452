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

  test("physical plan co-partitions and sorts both sides") {
    val df = AsOfJoinOps.asofJoin(purchases, clicks,
      "p_user", "c_user", "purchase_ts", "click_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("\\bSort\\b".r.findAllIn(plan).size >= 2, plan)
  }
}
