package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CurationStream

/** Streaming curation: flags must agree with the batch pipeline, exact
  * duplicates must be suppressed ACROSS micro-batches, and a restart on
  * the same checkpoint must not re-emit.
  */
class CurationStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // en-looking, high-quality text (stopword-heavy, alpha-only words);
  // the "bad" doc fails the stopword language heuristic (no stopwords)
  private val goodA = "the table scan is fast and the sort of the data is in a key"
  private val goodB = "a join of the line part and the order value is in the batch"
  private val bad = "zzz qqq xxx www yyy vvv"

  private def writeDocs(dir: String, file: String,
                        rows: Seq[(Long, String, String, Long)]): Unit = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (id, src, text, tsMicros) =>
      Row(id, src, text, new java.sql.Timestamp(tsMicros / 1000))
    }
    spark.createDataFrame(data.asJava, CurationStream.inputSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$dir/$file").toPath)
  }

  private def runOnce(in: String, out: String, chk: String): Unit = {
    val docs = spark.readStream.schema(CurationStream.inputSchema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch:
      .parquet(in)                     // dedup must span batches
    CurationStream.curated(docs)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
  }

  test("streaming curation filters, dedups across batches, and resumes") {
    val root = Files.createTempDirectory("curation").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val out = s"$root/out"; val chk = s"$root/chk"
    val base = 1700000000000000L

    writeDocs(in, "b1.parquet", Seq(
      (1L, "s0", goodA, base + 1000000L),
      (2L, "s0", bad, base + 2000000L)))
    writeDocs(in, "b2.parquet", Seq(
      (3L, "s1", goodA, base + 3000000L), // dup of doc 1, later batch
      (4L, "s1", goodB, base + 4000000L)))
    runOnce(in, out, chk)

    val got = spark.read.parquet(out)
    // bad fails the language heuristic; doc 3 is an exact dup of doc 1
    assert(got.count() == 2, got.collect().mkString(","))
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))

    // the emitted flags agree with the batch docFlags on the same rows
    val batch = graft.operators.TextQueries.docFlags(
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row(1L, "s0", goodA,
            new java.sql.Timestamp((base + 1000000L) / 1000)))),
          CurationStream.inputSchema))
      .select("text_md5", "n_tokens").head()
    assert(got.filter(col("doc_id") === 1)
      .select("text_md5", "n_tokens").head() == batch)

    // restart on the same checkpoint with no new input: nothing re-emitted
    runOnce(in, out, chk)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("duplicate arriving after the dedup window is re-admitted") {
    // the bounded-state contract: state keyed by content hash is
    // EVICTED once the watermark passes the window, so a duplicate
    // arriving later than the window is treated as new content. That
    // is the documented tradeoff of watermark-bounded dedup (state
    // cannot grow forever at 100 TB) — this test pins the behavior
    // instead of leaving it implicit.
    val root = Files.createTempDirectory("curation-late").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val out = s"$root/out"; val chk = s"$root/chk"
    val base = 1700000000000000L
    val window = 10L * 60 * 1000000 // the 10-minute default

    // a third distinct curated text for the watermark-advancing batches
    val goodC = "the key of the value is a part of the line in the order"

    writeDocs(in, "b1.parquet", Seq((1L, "s0", goodA, base)))
    // 2: inside the window → suppressed. Then two batches past the
    // window: the first advances the max event time, the second RUNS
    // with the advanced watermark and evicts expired state at its end
    // (watermark propagation and eviction are both one batch behind).
    // 3: the same text again, after eviction → re-admitted.
    writeDocs(in, "b2.parquet", Seq((2L, "s0", goodA, base + 1000000L)))
    writeDocs(in, "b3.parquet", Seq((4L, "s1", goodB, base + 3 * window)))
    writeDocs(in, "b4.parquet", Seq((5L, "s1", goodC, base + 3 * window + 1000000L)))
    writeDocs(in, "b5.parquet", Seq((3L, "s0", goodA, base + 3 * window + 2000000L)))
    runOnce(in, out, chk)

    val ids = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 4L, 5L), ids.toString)
  }
}
