package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AttributionStream

/** Streaming attribution must agree with rel_attribution on ordered
  * input (single-batch and ordered multi-batch), attribute each
  * conversion exactly once, respect the 7-day lookback, and never let
  * a late OLDER touch regress the per-user state.
  */
class AttributionStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def runStream(root: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .as[AttributionStream.Event]
    val q = AttributionStream.start(events, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(s"$root/out")
  }

  test("single batch replays the batch operator's attribution exactly") {
    val root = Files.createTempDirectory("attr-stream").toString
    new java.io.File(s"$root/in").mkdirs()
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      // user 1: click → purchase (credited), then an error between a
      // view and a purchase (view still credited)
      Row(1L, t("2024-01-01 10:00:00"), 1L, "click", 0.0),
      Row(2L, t("2024-01-01 11:00:00"), 1L, "purchase", 10.00),
      Row(3L, t("2024-01-01 12:00:00"), 1L, "view", 0.0),
      Row(4L, t("2024-01-01 12:30:00"), 1L, "error", 0.0),
      Row(5L, t("2024-01-01 13:00:00"), 1L, "purchase", 7.50),
      // user 2: purchase with no touch at all
      Row(6L, t("2024-01-01 10:00:00"), 2L, "purchase", 2.25)), schema)
    val out = runStream(root)
      .select("event_id", "channel", "cents").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out === Map(
      2L -> (("click", 1000L)),
      5L -> (("view", 750L)),
      6L -> (("unattributed", 225L))))
  }

  test("ordered multi-batch: touch state carries across epochs, lookback applies") {
    val root = Files.createTempDirectory("attr-stream2").toString
    new java.io.File(s"$root/in").mkdirs()
    // epoch 0: the touch; epoch 1: a purchase 1h later (credited from
    // carried state) and one 8 days later (outside lookback)
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      Row(1L, t("2024-01-01 10:00:00"), 1L, "signup", 0.0)), schema)
    StreamFiles.writeOneFile(spark, s"$root/in", "b2.parquet", Seq(
      Row(2L, t("2024-01-01 11:00:00"), 1L, "purchase", 3.00),
      Row(3L, t("2024-01-09 11:00:00"), 1L, "purchase", 4.00)), schema)
    Stage.orderStagedFiles(s"$root/in")
    val out = runStream(root)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "signup", 3L -> "unattributed"))
  }

  test("late older touch never regresses the state") {
    val root = Files.createTempDirectory("attr-stream3").toString
    new java.io.File(s"$root/in").mkdirs()
    // epoch 0: view at 12:00; epoch 1: a LATE click stamped 10:00
    // arrives, then a purchase — credit must stay with the view
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      Row(1L, t("2024-01-01 12:00:00"), 1L, "view", 0.0)), schema)
    StreamFiles.writeOneFile(spark, s"$root/in", "b2.parquet", Seq(
      Row(2L, t("2024-01-01 10:00:00"), 1L, "click", 0.0),
      Row(3L, t("2024-01-01 13:00:00"), 1L, "purchase", 1.00)), schema)
    Stage.orderStagedFiles(s"$root/in")
    val out = runStream(root)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(3L -> "view"))
  }

  test("microsecond-tied touches resolve on event_id, matching batch") {
    val root = Files.createTempDirectory("attr-stream5").toString
    new java.io.File(s"$root/in").mkdirs()
    // click (id=1) and view (id=2) at the SAME timestamp: the batch
    // window's (tus, event_id) frame credits the view; a tus-only
    // advance rule would keep the click
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      Row(1L, t("2024-01-01 10:00:00"), 1L, "click", 0.0),
      Row(2L, t("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Row(3L, t("2024-01-01 11:00:00"), 1L, "purchase", 5.00)), schema)
    val out = runStream(root)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(3L -> "view"))
  }

  test("cross-batch microsecond tie: equal-time higher-id touch replaces state") {
    val root = Files.createTempDirectory("attr-stream6").toString
    new java.io.File(s"$root/in").mkdirs()
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      Row(1L, t("2024-01-01 10:00:00"), 1L, "click", 0.0)), schema)
    StreamFiles.writeOneFile(spark, s"$root/in", "b2.parquet", Seq(
      Row(2L, t("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Row(3L, t("2024-01-01 11:00:00"), 1L, "purchase", 5.00)), schema)
    Stage.orderStagedFiles(s"$root/in")
    val out = runStream(root)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(3L -> "view"))
  }

  test("touch state expires one lookback after the touch") {
    val root = Files.createTempDirectory("attr-stream7").toString
    new java.io.File(s"$root/in").mkdirs()
    import spark.implicits._
    // b1: touches for users 1 and 2 at day 0
    StreamFiles.writeOneFile(spark, s"$root/in", "b1.parquet", Seq(
      Row(1L, t("2024-01-01 10:00:00"), 1L, "click", 0.0),
      Row(2L, t("2024-01-01 10:00:00"), 2L, "click", 0.0)), schema)
    // b2: user 2 touches again at day 10 — advances the watermark past
    // user 1's expiry (day 8)
    StreamFiles.writeOneFile(spark, s"$root/in", "b2.parquet", Seq(
      Row(3L, t("2024-01-11 10:00:00"), 2L, "view", 0.0)), schema)
    // b3: a purchase by user 2 — processed with the watermark at day
    // 10, so user 1's expired state is removed this batch; user 1 gets
    // no event here, exercising the pure-timeout path
    StreamFiles.writeOneFile(spark, s"$root/in", "b3.parquet", Seq(
      Row(4L, t("2024-01-11 12:00:00"), 2L, "purchase", 9.00)), schema)
    Stage.orderStagedFiles(s"$root/in")
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .as[AttributionStream.Event]
    val q = AttributionStream.start(events, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$root/out")
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(4L -> "view"))
    // the store ends bounded by ACTIVE users: user 1's day-0 touch
    // (expiry day 8 < final watermark day ~11) is gone, user 2 remains
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal)
    assert(stateRows.contains(1L),
      s"expected 1 surviving state row, got $stateRows")
  }

  test("sf0.001 ordered replay matches rel_attribution channel totals") {
    val root = Files.createTempDirectory("attr-stream4").toString
    val sf = "/root/testdata/sf0.001"
    // stage the corpus ordered by event time (the relay's staged-input
    // contract) in a handful of range files
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartitionByRange(4, col("ts"), col("event_id"))
      .write.parquet(s"$root/in")
    Stage.orderStagedFiles(s"$root/in")
    val streamed = runStream(root)
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = SparkEntry.queries("rel_attribution")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("revenue_cents"))))
      .toMap
    assert(streamed === batch)
  }
}
