package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMin
import graft.streaming.SketchStream

/** Streaming sketch maintenance: the stream-end snapshot must be
  * bit-identical to a batch sketch over the concatenated input — the
  * mergeability contract, exercised end to end across micro-batches.
  */
class SketchStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("incremental sketch equals the batch sketch over all input") {
    val root = Files.createTempDirectory("sketch-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    val batch1 = Seq((1L, "alpha beta beta gamma"), (2L, "beta gamma gamma"))
    val batch2 = Seq((3L, "alpha alpha delta"), (4L, "delta beta alpha"))
    Seq(("b1.parquet", batch1), ("b2.parquet", batch2)).foreach {
      case (name, rows) =>
        StreamFiles.writeOneFile(spark, in, name,
          rows.map { case (id, t) => org.apache.spark.sql.Row(id, t) }, schema)
    }

    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = SketchStream.start(spark, docs, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()

    // one snapshot per micro-batch
    val snaps = spark.read.parquet(s"$root/out")
    assert(snaps.select("batch_id").distinct().count() == 2)

    // stream-end state == single-pass batch sketch over everything
    val allTerms = (batch1 ++ batch2).flatMap(_._2.split(" "))
    val expected = allTerms.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce)
    val got = SketchStream.snapshot(spark, s"$root/out", 1)
    assert(got.sameElements(expected),
      "incremental merge diverged from the batch sketch")

    // estimates answer from the running state; exact here (no
    // collisions among 4 terms): alpha=4, beta=4, gamma=3, delta=2
    assert(SketchStream.estimate(spark, s"$root/out", 1, "alpha") == 4)
    assert(SketchStream.estimate(spark, s"$root/out", 1, "gamma") == 3)
    // mid-stream snapshot reflects only batch 1
    assert(SketchStream.estimate(spark, s"$root/out", 0, "delta") == 0)
    assert(SketchStream.estimate(spark, s"$root/out", 0, "beta") == 3)
    // estimates are total functions: missing dir / no committed batch
    // answer from the zero sketch instead of throwing
    assert(SketchStream.estimate(spark, s"$root/absent", 5, "alpha") == 0)
  }
}
