package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Online ANN serving: streamed query vectors must get exactly the
  * batch brute-force answers (same determinism contract), across
  * multiple micro-batches.
  */
class AnnStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val querySchema = StructType(Seq(
    StructField("q_id", LongType),
    StructField("q_embedding", ArrayType(DoubleType))))

  test("streamed queries get the batch top-k answers per micro-batch") {
    val root = Files.createTempDirectory("ann-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // two corpus vectors replayed as queries, one file each → two
    // micro-batches; each probe's top-1 must be itself (cosine 1.0),
    // proving scoring + ranking end to end
    Seq(3L, 7L).foreach { id =>
      graft.Tables.embeddings(spark, sf)
        .filter(col("vec_id") === id)
        .select(col("vec_id").as("q_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("q_embedding"))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/_stage")
      val part = new java.io.File(s"$in/_stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$in/q$id.parquet").toPath)
    }

    val queries = spark.readStream.schema(querySchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.AnnStream.start(
      spark, queries, sf, s"$root/out", s"$root/chk", k = 3)
    try {
      q.processAllAvailable()
      // the corpus is served from the session cache, not re-scanned
      // per micro-batch: after two batches the cached relation is
      // still resident (it is released only on termination)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "serving corpus must stay cached while the stream runs")
    } finally q.stop()

    val got = spark.read.parquet(s"$root/out")
    assert(got.count() == 6) // 2 queries × top-3
    // each probe's nearest neighbour is itself at sim 1.0, rank 1
    got.filter(col("rn") === 1).collect().foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"), r.toString)
      assert(r.getAs[Double]("sim") == 1.0, r.toString)
    }
    // one batch_id partition per micro-batch: the idempotence key a
    // replayed batch overwrites instead of appending duplicates
    assert(got.select("batch_id").distinct().count() == 2)
    // termination releases the serving cache (listener fires async)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(100)
    assert(spark.sharedState.cacheManager.isEmpty,
      "stream termination must release the serving corpus cache")
  }
}
