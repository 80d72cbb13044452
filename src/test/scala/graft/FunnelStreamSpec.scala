package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CdcRelay, FunnelStream}

/** The streaming funnel must agree with batch rel_funnel_windowed on
  * single-window histories (stage counts AND exact lag sums), evict
  * state once a funnel's window seals, and open the NEXT funnel on a
  * view past the window — by event time, not by eviction.
  */
class FunnelStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val base = 1700000000000000L // µs
  private val H = 3600L * 1000000L
  private val D7 = 7L * 24 * H
  private def r(id: Long, user: Long, offUs: Long, typ: String) =
    Row(id, new java.sql.Timestamp((base + offUs) / 1000), user, typ, 1.0,
      """{"k": 1}""")

  private def startStream(in: String, chk: String, name: String)
      : StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream.schema(CdcRelay.inputSchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelStream.Event]
    FunnelStream.stages(events)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  test("stream stage rows match batch rel_funnel_windowed on a " +
    "single-window history") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("funnelstream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // the SAME boundary corpus as the batch operator's semantics spec
    val rows = Seq(
      r(1, 10, 0, "view"),
      r(2, 10, 0, "click"),            // tie: excluded
      r(3, 10, H, "click"),            // t2 = +1h
      r(4, 10, H / 2, "purchase"),     // before t2: excluded
      r(5, 10, 2 * H, "purchase"),     // t3 = +2h
      r(6, 20, 0, "view"),
      r(7, 20, D7 + H, "click"),       // outside window
      r(8, 30, H, "click"),            // no view: never enters
      r(9, 30, 2 * H, "purchase"),
      r(10, 40, 0, "view"),
      r(11, 40, D7, "click"),          // exactly at boundary: in
      r(12, 40, D7 + H, "purchase"))   // past boundary: out
    StreamFiles.writeOneFile(spark, in, "e1.parquet", rows,
      CdcRelay.inputSchema)
    // the batch twin reads the table-shaped layout of the same rows
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    startStream(in, s"$root/chk", "funnel_parity").awaitTermination()

    val got = spark.table("funnel_parity")
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"),
        sum(col("lag_us")).as("sum_lag_us"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    val batch = graft.operators.RelationalQueries
      .funnelWindowed(spark, root).collect()
      .map(r => (r.getString(0).take(1).toInt, r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got == Seq((1, 3L, 0L), (2, 2L, H + D7), (3, 1L, H)))
  }

  test("stream multi-window rows match batch rel_funnel_cycles on a " +
    "two-window corpus") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("funnelcycles").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // two funnel windows per user, with the boundary cases that
    // distinguish the greedy chain from a naive grid:
    //  u1: completes cycle 1, then view@D7+H opens cycle 2 (click, no
    //      purchase);
    //  u2: bare view in cycle 1, full conversion in cycle 2;
    //  u3: t1=+1h so the window seals at D7+H — the view AT exactly
    //      D7+H is a tie (not strictly past), NOT a new window; the
    //      view at D7+2h is cycle 2.
    val rows = Seq(
      r(1, 1, 0, "view"), r(2, 1, H, "click"), r(3, 1, 2 * H, "purchase"),
      r(4, 1, D7 + H, "view"), r(5, 1, D7 + 2 * H, "click"),
      r(6, 2, 0, "view"), r(7, 2, D7 + 2 * H, "view"),
      r(8, 2, D7 + 3 * H, "click"), r(9, 2, D7 + 5 * H, "purchase"),
      r(10, 3, H, "view"), r(11, 3, D7, "click"),
      r(12, 3, D7 + H, "view"),    // == t1+W: tie, same window, no-op
      r(13, 3, D7 + 2 * H, "view")) // > t1+W: cycle 2 opens
    StreamFiles.writeOneFile(spark, in, "e1.parquet", rows,
      CdcRelay.inputSchema)
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    startStream(in, s"$root/chk", "funnel_cycles_parity").awaitTermination()

    // stream rows don't carry a cycle index — reconstruct it: a user's
    // stage-1 rows rank by time into cycles 1..k, and a stage-2/3 row
    // belongs to the latest stage-1 at-or-before it (windows are
    // disjoint by construction, so this is unambiguous)
    val raw = spark.table("funnel_cycles_parity")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getTimestamp(2).getTime, r.getLong(3))).toSeq
    val starts = raw.filter(_._2 == 1).groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted.zipWithIndex
        .map { case (t, i) => (t, i + 1) }).toMap
    def cycleOf(user: Long, t: Long): Int =
      starts(user).takeWhile(_._1 <= t).last._2
    val got = raw.groupBy(x => (cycleOf(x._1, x._3), x._2))
      .map { case ((c, st), xs) => (c, st, xs.size.toLong, xs.map(_._4).sum) }
      .toSeq.sorted

    val batch = graft.operators.RelationalQueries.funnelCycles(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1).take(1).toInt,
        r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got == Seq(
      (1, 1, 3L, 0L), (1, 2, 2L, D7), (1, 3, 1L, H),
      (2, 1, 3L, 0L), (2, 2, 2L, 2 * H), (2, 3, 1L, 2 * H)))
  }

  test("state evicts when the window seals; re-views recur by event time") {
    val root = Files.createTempDirectory("funnelstream2").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // era 1: u1 completes a funnel; a SAME-WINDOW re-view must not
    // double-start; u2 opens a funnel that never converts
    StreamFiles.writeOneFile(spark, in, "e1.parquet", Seq(
      r(1, 1, 0, "view"),
      r(2, 1, H, "click"),
      r(3, 1, 2 * H, "purchase"),
      r(4, 1, 3 * H, "view"),          // same window: NOT a new funnel
      r(5, 2, 0, "view")),
      CdcRelay.inputSchema)
    // era 2: u1 views again past the window (a NEW funnel, even though
    // the watermark hasn't evicted anything yet in this batch); the
    // far-future u9 view advances the watermark past every earlier
    // timeout so eviction is observable in the final progress metrics
    StreamFiles.writeOneFile(spark, in, "e2.parquet", Seq(
      r(6, 1, 10L * 24 * H, "view"),
      r(7, 9, 40L * 24 * H, "view")),
      CdcRelay.inputSchema)
    val q = startStream(in, s"$root/chk", "funnel_evict")
    q.awaitTermination()

    val stages = spark.table("funnel_evict")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    // u1: 1,2,3 then the recurring 1; u2: 1; u9: 1 — and NOTHING from
    // the same-window re-view
    assert(stages == Seq((1L, 1), (1L, 1), (1L, 2), (1L, 3),
      (2L, 1), (9L, 1)), stages.toString)

    // all earlier state timed out (u1's first window, u2's window, and
    // u1's recurring +10d funnel whose timeout +17d is below the
    // +40d-1h watermark); only u9's open funnel remains resident
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    assert(stateRows == 1L, s"expected only u9's funnel resident, " +
      s"got $stateRows state rows")
  }
}
