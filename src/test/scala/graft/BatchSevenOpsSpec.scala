package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the seventh round-10 batch (rel_attribution,
  * dedup_split_leakage): lookback windows, touch selection, and the
  * split-hash-consistent leakage flagging, pinned on hand-built
  * fixtures.
  */
class BatchSevenOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  // ---- rel_attribution ----------------------------------------------

  private val T0 = 1704067200000000L
  private val HourUs = 3600000000L
  private val DayUs = 86400000000L

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    val dir = tmp("attr")
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, tus, tp, v), i) =>
      (i.toLong, tus, u, tp, v, "{}")
    }.toDF("event_id", "tus", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("tus")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("attribution: lookback, channel credit, and non-touch immunity") {
    val dir = writeEvents(Seq(
      // user 1: click → purchase 1h later (credited to click), then a
      // second purchase 8 days after the click → outside lookback
      (1L, T0, "click", 0.0),
      (1L, T0 + HourUs, "purchase", 10.00),
      (1L, T0 + 8 * DayUs, "purchase", 5.00),
      // user 2: view, then an ERROR right before purchase — the error
      // must not steal or reset the attribution
      (2L, T0, "view", 0.0),
      (2L, T0 + HourUs, "error", 0.0),
      (2L, T0 + 2 * HourUs, "purchase", 7.50),
      // user 3: purchase with no prior touch at all
      (3L, T0, "purchase", 2.25)))
    val rows = SparkEntry.queries("rel_attribution")(spark, dir)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[Long]("n_conversions"), r.getAs[Long]("revenue_cents")))
    assert(rows.toSeq === Seq(
      ("click", 1L, 1000L),
      ("unattributed", 2L, 725L),
      ("view", 1L, 750L)))
  }

  test("attribution at sf0.001: conversions partition the purchase set") {
    val rows = SparkEntry.queries("rel_attribution")(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum === purchases)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "signup", "unattributed")))
  }

  // ---- dedup_split_leakage ------------------------------------------

  /** The split rule's bucket, replicated independently of the engine
    * (md5 top-60-bit hash of "split-v1:<id>", mod 100). */
  private def splitBucket(id: Long): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split-v1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(dig, 16) % 100
  }

  test("split leakage: a train doc sharing text with a test doc is flagged") {
    // find one test-bucket id and two train-bucket ids by the real rule
    val ids = (0L until 400L)
    val testId = ids.find(splitBucket(_) < 5).get
    val trainIds = ids.filter(splitBucket(_) >= 10).take(2)
    val leakText = (1 to 8).map(i => s"leak$i").mkString(" ")
    val cleanText = (1 to 8).map(i => s"clean$i").mkString(" ")
    val dir = tmp("leak")
    import spark.implicits._
    Seq(
      (testId, leakText), // held-out doc
      (trainIds(0), leakText), // train doc with the SAME passage → leak
      (trainIds(1), cleanText)) // train doc, unique text → clean
      .map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_split_leakage")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_test_hits"), r.getAs[Long]("n_val_hits"),
        r.getAs[Double]("leak_ratio")))
    assert(rows.toSeq === Seq((trainIds(0), 1L, 0L, 1.0)))
  }

  test("split leakage: a dual-split hash does not inflate the passage count") {
    // one train passage leaked into BOTH a test and a val doc: the
    // holdout join fans that passage out twice, so a post-join count
    // would report n_passages = 3 for this 2-passage doc (and
    // leak_ratio 0.666667 instead of 1.0)
    val ids = (0L until 400L)
    val testId = ids.find(splitBucket(_) < 5).get
    val valId = ids.find(i => splitBucket(i) >= 5 && splitBucket(i) < 10).get
    val trainId = ids.find(splitBucket(_) >= 10).get
    val leak = (1 to 8).map(i => s"leak$i").mkString(" ")
    // 12 tokens, stride 4 → exactly 2 passages; the first is the leak
    val trainText = leak + " " + (1 to 4).map(i => s"tail$i").mkString(" ")
    val dir = tmp("leak-dual")
    import spark.implicits._
    Seq((testId, leak), (valId, leak), (trainId, trainText))
      .map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_split_leakage")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_passages"), r.getAs[Long]("n_test_hits"),
        r.getAs[Long]("n_val_hits"), r.getAs[Double]("leak_ratio")))
    assert(rows.toSeq === Seq((trainId, 2L, 1L, 1L, 1.0)))
  }

  test("split leakage at sf0.001: flagged docs are train docs with real hits") {
    val rows = SparkEntry.queries("dedup_split_leakage")(spark, sf).collect()
    rows.foreach { r =>
      assert(splitBucket(r.getAs[Long]("doc_id")) >= 10) // train bucket
      val hits = r.getAs[Long]("n_test_hits") + r.getAs[Long]("n_val_hits")
      assert(hits > 0)
      assert(r.getAs[Double]("leak_ratio") > 0.0)
      // leak_ratio is rounded to 6 decimals, so allow half an ulp of
      // that grid above the raw ratio
      assert(r.getAs[Double]("leak_ratio") <=
        hits.toDouble / r.getAs[Long]("n_passages") + 5e-7)
    }
  }
}
