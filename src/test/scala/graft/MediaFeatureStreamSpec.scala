package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.MediaFeatureStream

/** Streaming feature extraction must produce EXACTLY the batch
  * operator's features for the same assets — same stub decoder, same
  * typed batch shape — and keep epochs idempotent.
  */
class MediaFeatureStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed features are batch-identical per asset") {
    import spark.implicits._
    val root = Files.createTempDirectory("media-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // stream the first 40 media assets in two files of 20
    val assets = graft.operators.MultimodalQueries.mediaTable(spark, sf)
      .filter(col("media_id") < 40)
    val schema = assets.schema
    StreamFiles.writeOneFile(spark, in, "m1.parquet",
      assets.filter(col("media_id") < 20).collect().toSeq, schema)
    StreamFiles.writeOneFile(spark, in, "m2.parquet",
      assets.filter(col("media_id") >= 20).collect().toSeq, schema)

    val media = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .as[graft.operators.MultimodalQueries.MediaIn]
    val q = MediaFeatureStream.start(media, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(s"$root/out")
      .select("media_id", "format", "size_bytes", "f0", "f1", "f2", "f3")
    val batch = graft.operators.MultimodalQueries.mediaFeatures(spark, sf)
      .filter(col("media_id") < 40)
      .select("media_id", "format", "size_bytes", "f0", "f1", "f2", "f3")
    assert(streamed.count() == 40)
    // exact equality both directions: the stub decode is deterministic,
    // so streamed and batch features must be bit-identical
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("two-era replay holds zero keyed state: the stream is a stateless map") {
    // No keyed store exists to grow with the corpus — decode is a pure
    // per-partition map and the sink is the product, not state. Pinned
    // across two eras (the second twice the first) via the progress
    // metrics, the same boundedness contract AttributionStream meets by
    // expiry and this stream meets by construction.
    import spark.implicits._
    val root = Files.createTempDirectory("media-eras").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val assets = graft.operators.MultimodalQueries.mediaTable(spark, sf)
    val schema = assets.schema
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    StreamFiles.writeOneFile(spark, in, "era1.parquet",
      assets.filter(col("media_id") < 10).collect().toSeq, schema)
    val media = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .as[graft.operators.MultimodalQueries.MediaIn]
    val q = MediaFeatureStream.start(media, s"$root/out", s"$root/chk")
    try {
      q.processAllAvailable()
      assert(stateRows(q) == 0L, s"era 1 left keyed state: ${q.lastProgress}")
      StreamFiles.writeOneFile(spark, in, "era2.parquet",
        assets.filter(col("media_id") >= 10 && col("media_id") < 30)
          .collect().toSeq, schema)
      q.processAllAvailable()
      assert(stateRows(q) == 0L, s"era 2 left keyed state: ${q.lastProgress}")
    } finally q.stop()
    assert(spark.read.parquet(s"$root/out").count() == 30)
  }
}
