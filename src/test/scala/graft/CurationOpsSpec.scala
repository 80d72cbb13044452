package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics of text_skipgrams, text_char_entropy, and
  * train_quality_gate on purpose-built corpora (the sf0.01 DuckDB gate
  * certifies bulk values):
  *
  *   - skipgrams: exact ±2-window pair set on a 4-token doc, symmetry
  *     of the pair counts, and the single-token degenerate case;
  *   - char entropy: closed-form values (0 for a constant string,
  *     ln k for a uniform k-character string);
  *   - quality gate: lower-median semantics — the kept half is always
  *     at least half, exact keep decisions on hand-scored docs.
  */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = tmp("curation")
    import spark.implicits._
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- text_skipgrams -----------------------------------------------

  test("skipgrams: exact ±2-window pairs on a 4-token document") {
    val dir = writeDocs(Seq((1L, "s", "a b c d")))
    val rows = SparkEntry.queries("text_skipgrams")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Seq(
      "a" -> "b", "a" -> "c", "b" -> "a", "b" -> "c", "b" -> "d",
      "c" -> "a", "c" -> "b", "c" -> "d", "d" -> "b", "d" -> "c")
      .map { case (x, y) => (x, y) -> 1L }.toMap
    assert(rows === expected)
  }

  test("skipgrams: pair counts are symmetric on any corpus") {
    val dir = writeDocs(Seq(
      (1L, "s", "x y x z y"), (2L, "s", "z z x")))
    val rows = SparkEntry.queries("text_skipgrams")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { case ((w1, w2), n) =>
      assert(rows(w2 -> w1) === n, s"asymmetric pair ($w1, $w2)")
    }
  }

  test("skipgrams: a single-token document emits no pairs") {
    val dir = writeDocs(Seq((1L, "s", "solo")))
    assert(SparkEntry.queries("text_skipgrams")(spark, dir).count() === 0L)
  }

  // ---- text_char_entropy --------------------------------------------

  private def entropyOf(dir: String, docId: Long): (Long, Long, Double) = {
    val r = SparkEntry.queries("text_char_entropy")(spark, dir)
      .filter(col("doc_id") === docId).collect().head
    (r.getAs[Long]("n_chars_counted"), r.getAs[Long]("n_distinct_chars"),
      r.getAs[Double]("entropy"))
  }

  test("char entropy: constant string scores 0, uniform k-char string scores ln k") {
    val dir = writeDocs(Seq(
      (1L, "s", "aaaa"),
      (2L, "s", "abab"),
      (3L, "s", "abcdabcd")))
    assert(entropyOf(dir, 1L) === ((4L, 1L, 0.0)))
    val ln2 = BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln4 = BigDecimal(math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(entropyOf(dir, 2L) === ((4L, 2L, ln2)))
    assert(entropyOf(dir, 3L) === ((8L, 4L, ln4)))
  }

  // ---- train_quality_gate -------------------------------------------

  test("quality gate: lower-median keep decisions are exact on hand-scored docs") {
    // single-token docs score: all-alpha 1.0, all-digit 0.4, all-punct 0.1
    val dir = writeDocs(Seq(
      (1L, "A", "aaaa"), (2L, "A", "aaaa"),
      (3L, "B", "aaaa"), (4L, "B", "1111"), (5L, "B", "????")))
    val rows = SparkEntry.queries("train_quality_gate")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("kept_ratio"), r.getAs[Long]("kept_tokens"),
          r.getAs[Double]("median_q")))).toMap
    assert(rows("A") === ((2L, 2L, 1.0, 2L, 1.0)))
    // B: hist {0.1:1, 0.4:1, 1.0:1}, tot=3 — cum(0.4)=2, 2*2>=3 →
    // median 0.4; kept = the 0.4 and 1.0 docs
    assert(rows("B") === ((3L, 2L, 0.666667, 2L, 0.4)))
  }

  test("quality gate: the kept half is never less than half, per source") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("train_quality_gate")(spark, dir)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_kept") * 2 >= r.getAs[Long]("n_docs"),
          s"source ${r.getAs[String]("source")}")
      }
  }

  // ---- dedup_edit_verify --------------------------------------------

  test("edit verify: exact dup scores 0, late-word rewrite verifies, disjoint docs never pair") {
    val base = (1 to 10).map(i => s"tok$i").mkString(" ")
    val lateEdit = (1 to 9).map(i => s"tok$i").mkString(" ") + " tokX"
    val disjoint = (1 to 10).map(i => s"other$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, "s", base), (2L, "s", base),
      (3L, "s", lateEdit), (4L, "s", disjoint)))
    val rows = SparkEntry.queries("dedup_edit_verify")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Int]("edit_dist"), r.getAs[Boolean]("is_dup")))).toMap
    // exact duplicate: all bands collide, distance 0
    assert(rows((1L, 2L)) === ((0, true)))
    // doc 4 shares no shingles with anything — no candidate pair at all
    assert(!rows.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // docs 1/2 vs 3 share 7 of 8 shingles — LSH does surface the pair,
    // and the suffix rewrite ("tok10" → "tokX": substitute + delete)
    // verifies as a duplicate
    assert(rows((1L, 3L)) === ((2, true)))
  }

  test("edit verify: normalized distance uses the 200-char prefix cap") {
    // two 300-char docs differing only in the uncompared tail: prefix
    // distance 0 even though the full texts differ
    val head = Array.fill(40)("aaaaa").mkString(" ") // 239 chars
    val dir = writeDocs(Seq(
      (1L, "s", head + " tail1 xxxxx"),
      (2L, "s", head + " tail2 yyyyy")))
    val r = SparkEntry.queries("dedup_edit_verify")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("edit_dist") === 0)
    assert(r.head.getAs[Double]("norm_dist") === 0.0)
  }

  // ---- vec_norm_audit -----------------------------------------------

  test("norm audit: buckets, zero vectors, and NaN components are all surfaced") {
    val dim = 64
    val dir = tmp("normaudit")
    import spark.implicits._
    Seq(
      // norm 1.0 → bucket 4
      (1L, Array.tabulate(dim)(j => if (j == 0) 1.0f else 0.0f), 0),
      // norm 1.5 → bucket 6
      (2L, Array.tabulate(dim)(j => if (j == 0) 1.5f else 0.0f), 0),
      // zero vector → bucket 0, n_zero
      (3L, Array.fill(dim)(0.0f), 0),
      // NaN component → n_nan (norm NaN: floor(NaN*4) is null-bucket)
      (4L, Array.tabulate(dim)(j => if (j == 0) Float.NaN else 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("vec_norm_audit")(spark, dir)
      .collect()
      .map(r => Option(r.get(r.fieldIndex("bucket"))).map(_.asInstanceOf[Long]) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_zero"), r.getAs[Long]("n_nan"))))
      .toMap
    assert(rows(Some(0L)) === ((1L, 1L, 0L)))
    assert(rows(Some(4L)) === ((1L, 0L, 0L)))
    assert(rows(Some(6L)) === ((1L, 0L, 0L)))
    assert(rows(None)     === ((1L, 0L, 1L))) // the NaN-norm row
  }
}
