package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CdcRelay

/** Watermarked stream-stream inner join: purchases joined to clicks of
  * the same user within the preceding 10 minutes, both sides unbounded
  * streams with bounded state — must equal the batch range join.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("stream-stream interval join equals the batch range join") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("ssj").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    val base = 1700000000000000L
    // users change every 5 events so same-user click→purchase pairs land
    // inside the 10-minute band (2-minute spacing)
    val rows = (0 until 200).map { i =>
      val tpe = if (i % 3 == 0) "click" else if (i % 3 == 1) "purchase" else "view"
      Row(i.toLong, new java.sql.Timestamp((base + i * 120000000L) / 1000),
        (i / 5).toLong % 6, tpe, 1.0, """{"k": 1}""")
    }
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    def stream = spark.readStream.schema(CdcRelay.inputSchema).parquet(in)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")

    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") < col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES"))

    val q = joined.writeStream
      .format("memory").queryName("ss_join")
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("ss_join")
      .select("purchase_id", "click_id").orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val batch = spark.read.parquet(in)
    val bc = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val bp = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val expected = bp.join(bc,
        col("p_user") === col("c_user") &&
          col("click_ts") < col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES"))
      .select("purchase_id", "click_id").orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(streamed.nonEmpty)
    assert(streamed == expected)
  }

  test("stream-static enrichment join broadcasts the dimension") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("ssd").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = 1700000000000000L
    val rows = (0 until 50).map { i =>
      Row(i.toLong, new java.sql.Timestamp((base + i * 1000000L) / 1000),
        (i % 25).toLong, "view", 1.0, """{"k": 1}""")
    }
    spark.createDataFrame(rows.asJava, CdcRelay.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(in)

    // static dimension: the customer table keyed to user ids
    val dim = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("user_key"), col("c_mktsegment"))

    val enriched = spark.readStream.schema(CdcRelay.inputSchema).parquet(in)
      .join(broadcast(dim), col("user_id") === col("user_key"))
      .select("event_id", "user_id", "c_mktsegment")
    val q = enriched.writeStream
      .format("memory").queryName("enriched")
      .option("checkpointLocation", s"$root/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("enriched")
    assert(got.count() == 50) // every user_id 0-24 exists in customer
    // the enrichment column is populated from the static side
    assert(got.filter(col("c_mktsegment").isNull).count() == 0)
  }
}
