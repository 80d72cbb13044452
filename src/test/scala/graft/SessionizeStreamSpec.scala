package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CdcRelay, SessionizeStream}

/** flatMapGroupsWithState sessionization: closed sessions from the
  * stream must match the batch gaps-and-islands computation for every
  * session that the watermark has sealed.
  */
class SessionizeStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("stateful streaming sessions match batch gaps-and-islands") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("sess").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // user 1: two sessions (40-min gap); user 2: one session; plus a
    // late "far future" event per user to advance the watermark past
    // every earlier session's timeout
    val base = 1700000000000000L
    def r(id: Long, user: Long, offMin: Long) =
      Row(id, new java.sql.Timestamp((base + offMin * 60000000L) / 1000),
        user, "view", 1.0, """{"k": 1}""")
    val rows = Seq(
      r(1, 1, 0), r(2, 1, 10), r(3, 1, 50), // user1: [0,10], [50]
      r(4, 2, 5),                           // user2: [5]
      r(5, 1, 600), r(6, 2, 600))           // watermark advancers
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    val events = spark.readStream.schema(CdcRelay.inputSchema).parquet(in)
      .select(col("user_id"), col("ts")).as[SessionizeStream.Event]
    val q = SessionizeStream.sessions(events)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("sessions")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))

    def ms(offMin: Long) = (base + offMin * 60000000L) / 1000
    val want = Array(
      (1L, ms(0), ms(10), 2L),   // user1 session A
      (1L, ms(50), ms(50), 1L),  // user1 session B
      (2L, ms(5), ms(5), 1L))    // user2 session
    // the watermark-advancer events' own sessions are still open → not emitted
    assert(got.toSeq == want.toSeq, got.mkString(", "))
  }

  test("a late in-watermark event extends the session backward safely") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("sess2").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = 1700000000000000L
    def row(id: Long, offMin: Long) =
      Row(id, new java.sql.Timestamp((base + offMin * 60000000L) / 1000),
        9L, "view", 1.0, """{"k": 1}""")
    def write(name: String, rows: Seq[Row]): Unit = {
      spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
      val part = new java.io.File(s"$root/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(s"$in/$name").toPath)
    }
    // batch 1: events at t=20 and t=30; batch 2: a LATE event at t=10
    // (within the 1h watermark, gap to session start = 10min) then the
    // closer at t=120 (gap > 30min) and an advancer at t=600
    write("b1.parquet", Seq(row(1, 20), row(2, 30)))
    write("b2.parquet", Seq(row(3, 10), row(4, 120), row(5, 600)))

    val events = spark.readStream.schema(CdcRelay.inputSchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .select(col("user_id"), col("ts")).as[SessionizeStream.Event]
    val q = SessionizeStream.sessions(events)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("late_sessions").orderBy("session_start")
      .collect().map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
    def ms(offMin: Long) = (base + offMin * 60000000L) / 1000
    // the late event must extend the open session to [10, 30] with 3
    // events; t=120 then closes it — bounds never move backward-only
    assert(got.headOption.contains((ms(10), ms(30), 3L)), got.mkString(", "))
  }

  test("a gap of exactly 30min + 1µs splits the session (microsecond " +
      "boundary — ms truncation would merge)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import graft.streaming.EventTime
    val root = Files.createTempDirectory("sess3").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))

    val base = 1700000000000000L // whole second, micros
    val first = base + 500                                    // x.0005s
    val second = first + SessionizeStream.GapMicros + 1       // gap + 1µs
    // truncated to milliseconds both land on whole-ms marks exactly
    // GapMicros apart — a ms-truncated gap test would NOT split here
    val rows = Seq(
      Row(7L, EventTime.fromMicros(first)),
      Row(7L, EventTime.fromMicros(second)),
      Row(7L, EventTime.fromMicros(base + 600L * 60000000L))) // advancer
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    val events = spark.readStream.schema(schema).parquet(in)
      .as[SessionizeStream.Event]
    val q = SessionizeStream.sessions(events)
      .writeStream.format("memory").queryName("micro_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("micro_sessions").orderBy("session_start")
      .collect().map(r => (EventTime.toMicros(r.getTimestamp(1)),
        EventTime.toMicros(r.getTimestamp(2)), r.getLong(3)))
    // two singleton sessions, bounds microsecond-exact
    assert(got.toSeq == Seq((first, first, 1L), (second, second, 1L)),
      got.mkString(", "))
  }

  test("a backfill batch far below the watermark closes its sessions " +
      "immediately instead of aborting the query") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("sess4").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = 1700000000000000L
    def row(id: Long, user: Long, offMin: Long) =
      Row(id, new java.sql.Timestamp((base + offMin * 60000000L) / 1000),
        user, "view", 1.0, """{"k": 1}""")
    def write(name: String, rows: Seq[Row]): Unit = {
      spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
      val part = new java.io.File(s"$root/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$in/$name").toPath)
    }
    // batch 1 advances the watermark to t=540 (600 - 1h); batch 2 is a
    // backfill whose session timeout (t=40) is far BELOW it —
    // mapGroupsWithState does not filter late rows, so without the
    // clamp the state write aborts the whole query
    write("b1.parquet", Seq(row(1, 1, 600)))
    write("b2.parquet", Seq(row(2, 2, 0), row(3, 2, 10)))

    val events = spark.readStream.schema(CdcRelay.inputSchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .select(col("user_id"), col("ts")).as[SessionizeStream.Event]
    val q = SessionizeStream.sessions(events)
      .writeStream.format("memory").queryName("backfill_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def ms(offMin: Long) = (base + offMin * 60000000L) / 1000
    val got = spark.table("backfill_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
    // the backfilled session is emitted at once; user 1's stays open
    assert(got.toSeq == Seq((2L, ms(0), ms(10), 2L)), got.mkString(", "))
  }

  test("multi-batch backfill DROPS events beyond the one-batch watermark " +
      "lag (documented divergence from batch sessionize)") {
    // The exec's late-row filter uses the PREVIOUS batch's watermark,
    // so a backfill batch right after a watermark jump still reaches
    // the state function (and the clamp early-closes it — previous
    // test). But an event arriving one batch LATER sits below the late
    // filter and never reaches the function at all: batch
    // rel_sessionize over the same events would merge it into one
    // session (0..20, n=3); the stream emits (0..10, n=2) and excludes
    // t=20 — late-data exclusion, the standard watermark contract.
    // (A SPLIT session cannot happen: an event close enough to merge
    // with an early-closed session is necessarily below every later
    // batch's late filter.) Replays through ONE batch (no
    // maxFilesPerTrigger cap) sessionize exactly.
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("sess5").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = 1700000000000000L
    def row(id: Long, user: Long, offMin: Long) =
      Row(id, new java.sql.Timestamp((base + offMin * 60000000L) / 1000),
        user, "view", 1.0, """{"k": 1}""")
    def write(name: String, rows: Seq[Row]): Unit = {
      spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
      val part = new java.io.File(s"$root/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$in/$name").toPath)
    }
    // batch 1 advances the watermark far past the backfill range;
    // batches 2 and 3 deliver user 2's events 10 minutes apart (well
    // inside the 30-minute gap) in SEPARATE micro-batches
    write("b1.parquet", Seq(row(1, 1, 600)))
    write("b2.parquet", Seq(row(2, 2, 0), row(3, 2, 10)))
    write("b3.parquet", Seq(row(4, 2, 20)))

    val events = spark.readStream.schema(CdcRelay.inputSchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .select(col("user_id"), col("ts")).as[SessionizeStream.Event]
    val q = SessionizeStream.sessions(events)
      .writeStream.format("memory").queryName("backfill_split_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def ms(offMin: Long) = (base + offMin * 60000000L) / 1000
    val got = spark.table("backfill_split_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSeq.sortBy(_._2)
    // batch semantics would give ONE session (0..20, n=3); the stream
    // emits the lag-window part and DROPS the t=20 straggler
    assert(got == Seq((2L, ms(0), ms(10), 2L)), got.mkString(", "))
  }
}
