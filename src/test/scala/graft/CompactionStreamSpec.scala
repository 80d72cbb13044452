package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CompactionStream

/** Streaming compaction must track the latest event per key across
  * epochs, never regress on a late event (count bumps, state stays),
  * and hold exactly one state row per key — batch-identical to the
  * cdc_compact definition.
  */
class CompactionStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("latest-per-key state survives late events and updates per epoch") {
    val root = Files.createTempDirectory("compact-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // epoch 0: user 1 arrives out of order (event 11 is the latest by
    // ts), user 2 has one event
    StreamFiles.writeOneFile(spark, in, "b1.parquet", Seq(
      Row(11L, t("2024-01-01 10:05:00"), 1L, "deposit", 3.456),
      Row(10L, t("2024-01-01 10:00:00"), 1L, "open", 1.0),
      Row(20L, t("2024-01-01 11:00:00"), 2L, "open", 2.0)), schema)
    // epoch 1: user 1 gets a NEWER event; user 2 gets a LATE event
    // (older ts — count bumps, state must not regress); user 3 is new
    StreamFiles.writeOneFile(spark, in, "b2.parquet", Seq(
      Row(12L, t("2024-01-01 12:00:00"), 1L, "close", 9.995),
      Row(19L, t("2024-01-01 10:30:00"), 2L, "late", 7.0),
      Row(30L, t("2024-01-01 13:00:00"), 3L, "open", 5.0)), schema)

    import spark.implicits._
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .as[CompactionStream.Event]
    val q = CompactionStream.start(events, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(s"$root/out")
    // final state = each key's row from the last batch that touched it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("batch_id").desc)
    val fin = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "n_events", "last_event_id", "last_type",
        "last_value_cents")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap

    // 9.995 as a double is 9.99499…, so *100 rounds to 999 — the same
    // value the batch operator's round(value * 100) produces
    assert(fin(1L) == ((3L, 12L, "close", 999L)))
    assert(fin(2L) == ((2L, 20L, "open", 200L))) // late event didn't regress
    assert(fin(3L) == ((1L, 30L, "open", 500L)))

    // epoch 0 emitted user 1's state as of event 11 — the update-mode
    // refresh a downstream table consumed before epoch 1 arrived
    val e0 = out.filter(col("batch_id") === 0 && col("user_id") === 1)
      .select("n_events", "last_event_id").head()
    assert((e0.getLong(0), e0.getLong(1)) == ((2L, 11L)))
    // exactly one row per (touched key × epoch): update semantics
    assert(out.groupBy("batch_id", "user_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("same-millisecond events order by microseconds — identical to " +
      "cdc_compact's unix_micros ordinal") {
    val root = Files.createTempDirectory("compact-micros").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // Both events share the SAME millisecond (10:00:00.001) and differ
    // only in microseconds. The micros-later event has the SMALLER
    // event_id, so a millisecond-truncated ordinal would tie on time
    // and let the event_id tiebreak pick the wrong row.
    val tLate = t("2024-01-01 10:00:00.001999")  // id 99  — the winner
    val tEarly = t("2024-01-01 10:00:00.001123") // id 100 — must lose
    // epoch 0 installs the winner; epoch 1's same-millisecond event
    // must bump the count WITHOUT regressing the state
    StreamFiles.writeOneFile(spark, in, "b1.parquet", Seq(
      Row(99L, tLate, 1L, "late", 2.0)), schema)
    StreamFiles.writeOneFile(spark, in, "b2.parquet", Seq(
      Row(100L, tEarly, 1L, "early", 1.0)), schema)

    import spark.implicits._
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .as[CompactionStream.Event]
    val q = CompactionStream.start(events, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(s"$root/out")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("batch_id").desc)
    val streamed = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "n_events", "last_ts", "last_type",
        "last_event_id", "last_value_cents")

    // batch cdc_compact definition over the same rows: row_number over
    // (unix_micros(ts) DESC, event_id DESC)
    import scala.jdk.CollectionConverters._
    val batch = spark.createDataFrame(Seq(
      Row(99L, tLate, 1L, "late", 2.0),
      Row(100L, tEarly, 1L, "early", 1.0)).asJava, schema)
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
    val expected = batch
      .withColumn("n_events",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")))
      .withColumn("rn", row_number().over(bw))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("ts").as("last_ts"),
        col("event_type").as("last_type"),
        col("event_id").as("last_event_id"),
        round(col("value") * 100).cast("long").as("last_value_cents"))

    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty,
      s"stream=${streamed.collect().mkString} batch=${expected.collect().mkString}")
    // and the emitted last_ts keeps its sub-millisecond digits
    assert(streamed.select("last_ts").head().getTimestamp(0) == tLate)
  }
}
