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
}
