package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DecontaminateStream

/** Streaming decontamination must flag a doc that copies eval text the
  * moment its batch arrives, pass clean docs through, and stay
  * batch-identical in its per-doc passage accounting.
  */
class DecontaminateStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("an eval-copying doc is flagged in its arrival batch") {
    val root = Files.createTempDirectory("decon-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // batch 1: genuine corpus docs (train side). batch 2: one doc that
    // verbatim-copies an eval doc (doc_id 0 % 13 == 0) — guaranteed
    // contamination — plus one clean synthetic doc.
    val evalText = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      StreamFiles.writeOneFile(spark, in, name,
        rows.map { case (id, t) => org.apache.spark.sql.Row(id, t) }, schema)
    writeBatch("b1.parquet", Seq(
      (1001L, "one two three four five six seven eight nine ten"),
      (1003L, "too short")))
    writeBatch("b2.parquet", Seq(
      (9999L, evalText),
      (1002L, "red orange yellow green blue indigo violet white black")))

    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = DecontaminateStream.start(
      spark, docs, sf, s"$root/out", s"$root/chk")
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(s"$root/out")
    assert(out.select("batch_id").distinct().count() == 2)

    // the copier is contaminated on EVERY passage; the clean docs
    // aren't flagged; passage accounting matches the shared definition
    val copier = out.filter(col("doc_id") === 9999L).head()
    assert(copier.getAs[Boolean]("contaminated"), copier.toString)
    assert(copier.getAs[Long]("n_hits") == copier.getAs[Long]("n_passages"),
      copier.toString)
    val evalPassages = graft.operators.TextQueries
      .passageHashes(
        graft.Tables.documents(spark, sf).filter(col("doc_id") === 0), 1)
      .count()
    assert(copier.getAs[Long]("n_passages") == evalPassages)
    out.filter(col("doc_id").isin(1001L, 1002L)).collect().foreach { r =>
      assert(!r.getAs[Boolean]("contaminated"), r.toString)
      assert(r.getAs[Long]("n_hits") == 0L, r.toString)
    }
    // a sub-8-token doc still gets an explicit clean verdict (0
    // passages tested), not a silent absence from the report
    val short = out.filter(col("doc_id") === 1003L).head()
    assert(!short.getAs[Boolean]("contaminated"), short.toString)
    assert(short.getAs[Long]("n_passages") == 0L, short.toString)
    // lifecycle: the cached eval set is released on termination
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(100)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("two-era replay holds zero keyed state: resident state is the eval cache only") {
    // The stream is STATELESS by design — every micro-batch joins
    // against the static (benchmark-bounded) eval cache and writes an
    // idempotent batch_id partition; there is no keyed store to expire.
    // This pins it: after an era of input AND after a second era twice
    // the size, the progress metrics must report zero state-store rows —
    // the resident footprint cannot grow with the crawl.
    val root = Files.createTempDirectory("decon-eras").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    def era(name: String, ids: Range): Unit =
      StreamFiles.writeOneFile(spark, in, name,
        ids.map(i => org.apache.spark.sql.Row(i.toLong,
          s"era doc $i one two three four five six seven eight")), schema)
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

    era("era1.parquet", 2000 until 2010)
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = DecontaminateStream.start(
      spark, docs, sf, s"$root/out", s"$root/chk")
    try {
      q.processAllAvailable()
      assert(stateRows(q) == 0L, s"era 1 left keyed state: ${q.lastProgress}")
      era("era2.parquet", 3000 until 3020)
      q.processAllAvailable()
      assert(stateRows(q) == 0L, s"era 2 left keyed state: ${q.lastProgress}")
    } finally q.stop()
    // every doc of both eras got its verdict — statelessness did not
    // cost coverage
    assert(spark.read.parquet(s"$root/out").count() == 30)
  }
}
