package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CdcRelay

/** B16/B31 streaming form: a watermarked tumbling-window aggregation
  * over the event stream must, after draining, agree exactly with the
  * batch groupBy(date_trunc) over the same data.
  */
class StreamingWindowSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streaming windowed counts equal the batch computation") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("swin").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    val base = 1700000000000000L // epoch micros, on the hour? not needed
    val rows = (0 until 120).map { i =>
      Row(i.toLong, new java.sql.Timestamp((base + i * 90000000L) / 1000),
        (i % 7).toLong, if (i % 2 == 0) "click" else "view", 1.0, """{"k": 1}""")
    }
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    val stream = spark.readStream.schema(CdcRelay.inputSchema).parquet(in)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

    val q = stream.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("win_counts")
      .orderBy("w_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))

    val batch = spark.read.parquet(in)
      .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("w_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("update-mode routing fan-out matches the batch routing counts") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("supd").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = 1700000000000000L
    val rows = (0 until 60).map { i =>
      Row(i.toLong, new java.sql.Timestamp((base + i * 1000000L) / 1000),
        (i % 5).toLong, if (i % 3 == 0) "click" else "view", 1.0, """{"k": 1}""")
    }
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    val counts = spark.readStream.schema(CdcRelay.inputSchema).parquet(in)
      .select(concat_ws(".", lit("tb"), col("user_id"), col("event_type")).as("subject"))
      .groupBy("subject").count()
    val q = counts.writeStream
      .format("memory").queryName("route_counts")
      .outputMode("update")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // update mode re-emits a key on change: the LAST row per subject is
    // its final count
    val streamed = spark.table("route_counts")
      .groupBy("subject").agg(max("count").as("count"))
      .orderBy("subject").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = spark.read.parquet(in)
      .select(concat_ws(".", lit("tb"), col("user_id"), col("event_type")).as("subject"))
      .groupBy("subject").count().orderBy("subject").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
