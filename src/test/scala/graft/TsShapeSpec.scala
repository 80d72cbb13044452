package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the time-series pair (rel_ts_paa, rel_ts_shape_match):
  * segment arithmetic at the month boundaries, explicit zero-fill,
  * rank-word construction, and the exact L1 verify — pinned on a
  * hand-built fixture where every PAA value and the winning pair are
  * known, plus mass-conservation checks on the sf0.001 corpus.
  */
class TsShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val T0 = 1704067200000000L
  private val SegUs = 2678400000000L / 8 // month span / 8 segments

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  /** rows = (user_id, seg, dollars); one event per row, placed just
    * inside its segment. */
  private def writeEvents(rows: Seq[(Long, Int, Double)]): String = {
    val dir = tmp("tsev")
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, seg, v), i) =>
      (i.toLong, T0 + seg * SegUs + 1000L, u, "purchase", v, "{}")
    }.toDF("event_id", "tus", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("tus")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("paa: segment placement, exact cent sums, and zero-fill") {
    // single user: the per-user activity window is [first, last] event
    val dir = writeEvents(Seq(
      (1L, 0, 3.00), (1L, 0, 0.50), // two events fold into seg 0
      (1L, 7, 1.25))) // the span tail lands in seg 7, not out of range
    val rows = SparkEntry.queries("rel_ts_paa")(spark, dir)
      .collect().map(r => (r.getAs[Long]("seg"), r.getAs[Long]("paa"),
        r.getAs[Long]("n_events")))
    assert(rows.length === 8)
    assert(rows.toSeq === Seq(
      (0L, 350L, 2L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 0L, 0L), (5L, 0L, 0L), (6L, 0L, 0L), (7L, 125L, 1L)))
  }

  test("shape match: tiny-corpus tier brute-force-verifies every pair exactly") {
    // <100 users → the count(*)-derived alphabet collapses to one word
    // ("11111111"): at this size blocking buys nothing, so the
    // operator deliberately verifies ALL pairs — and the exact L1s in
    // cents are the assertion. Per-user windows map each user's three
    // active slots to segments 0, 3, 7 of their own span.
    val dir = writeEvents(Seq(
      (1L, 0, 3.00), (1L, 1, 2.00), (1L, 2, 1.00),
      (2L, 0, 6.00), (2L, 1, 4.00), (2L, 2, 2.00),
      (3L, 0, 1.00), (3L, 1, 2.00), (3L, 2, 3.00)))
    val rows = SparkEntry.queries("rel_ts_shape_match")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
        r.getAs[String]("word"), r.getAs[Long]("l1_cents")))
    // L1(1,3) = |300−100| + |200−200| + |100−300| = 400
    // L1(1,2) = |300−600| + |200−400| + |100−200| = 600
    // L1(2,3) = |600−100| + |400−200| + |200−300| = 800
    assert(rows.toSeq === Seq(
      (1L, 3L, "11111111", 400L),
      (1L, 2L, "11111111", 600L),
      (2L, 3L, "11111111", 800L)))
  }

  test("paa at sf0.001: mass conservation and 8 segments per user") {
    val paa = SparkEntry.queries("rel_ts_paa")(spark, sf)
    val ev = Tables.events(spark, sf)
    val users = ev.select("user_id").distinct().count()
    assert(paa.count() === users * 8)
    val totalPaa = paa.agg(sum("paa")).head().getLong(0)
    val totalCents = ev.agg(sum(round(col("value") * 100).cast("long")))
      .head().getLong(0)
    assert(totalPaa === totalCents)
    val totalEvents = paa.agg(sum("n_events")).head().getLong(0)
    assert(totalEvents === ev.count())
  }

  test("shape match at sf0.001: verified pairs share their block word") {
    val rows = SparkEntry.queries("rel_ts_shape_match")(spark, sf).collect()
    assert(rows.length <= 20)
    // result ordered by distance with the unique pair tiebreak
    val l1s = rows.map(_.getAs[Long]("l1_cents"))
    assert(l1s.sameElements(l1s.sorted))
    rows.foreach { r =>
      assert(r.getAs[Long]("user_a") < r.getAs[Long]("user_b"))
      assert(r.getAs[String]("word").length === 8)
    }
  }
}
