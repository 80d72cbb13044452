package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus behavior of rel_funnel_cycles' iterative frontier:
  * the zero-'view' corpus must return an EMPTY result in the query's
  * (cycle, stage, n_users, sum_lag_us) shape — matching the oracle's
  * graceful zero rows — and a per-user history spanning more than
  * MaxFunnelCycles windows must hit the LOUD refusal, never a silent
  * truncation of later cycles.
  */
class FunnelCyclesEdgeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def writeEvents(dir: String,
      rows: Seq[(Long, Timestamp, String)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusDays(day.toLong))

  test("zero 'view' events yield an empty frame in the output schema") {
    val dir = Files.createTempDirectory("graft-funnel-noview").toString
    // clicks and purchases exist, but no view ever opens a window
    writeEvents(dir, Seq(
      (1L, ts(0), "click"), (1L, ts(1), "purchase"), (2L, ts(2), "click")))
    val out = operators.RelationalQueries.funnelCycles(spark, dir)
    assert(out.columns.toSeq == Seq("cycle", "stage", "n_users", "sum_lag_us"))
    assert(out.count() == 0L)
  }

  test("a user spanning more than MaxFunnelCycles windows triggers the refusal") {
    val dir = Files.createTempDirectory("graft-funnel-refuse").toString
    // one view every 8 days (> the 7-day window, so every view opens a
    // NEW cycle) for 70 windows — past the 64-round budget
    writeEvents(dir, (0 until 70).map(k => (1L, ts(8 * k), "view")))
    val e = intercept[IllegalStateException] {
      operators.RelationalQueries.funnelCycles(spark, dir).collect()
    }
    assert(e.getMessage.contains("MaxFunnelCycles"))
  }

  test("a 20-window user history resolves exactly 20 cycles, stages intact") {
    val dir = Files.createTempDirectory("graft-funnel-20").toString
    val views = (0 until 20).map(k => (1L, ts(8 * k), "view"))
    // convert inside cycle 1 and cycle 20 only
    val rows = views ++ Seq(
      (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      (1L, ts(8 * 19 + 1), "click"))
    writeEvents(dir, rows)
    val out = operators.RelationalQueries.funnelCycles(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.count(_._2 == "1_view") == 20)
    assert(out.filter(_._2 == "2_click").map(_._1).sorted == Seq(1, 20))
    assert(out.filter(_._2 == "3_purchase").map(_._1) == Seq(1))
  }
}
