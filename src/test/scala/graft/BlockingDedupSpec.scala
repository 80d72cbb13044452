package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-9 blocking-dedup scale fixes at the result level
  * (dedup_ngram_jaccard / dedup_containment, TextQueries):
  *
  *   - sparse char-8-gram blocking minima still pair what they should:
  *     a duplicate cluster under the cap is fully scored, and docs
  *     shorter than the 8-char blocking gram flow through (char_ngrams
  *     emits one truncated gram, same as the oracle's substring);
  *   - the ≤64 degenerate-block cap drops a block its key cannot split
  *     instead of emitting its quadratic pair count — the documented
  *     trade: a corpus-sized block of exact duplicates is exact-dedup's
  *     job, the near-dup scorer skips it rather than scoring n² pairs.
  */
class BlockingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("blockspec").toString
    import spark.implicits._
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    sys.addShutdownHook(
      Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  private def pairs(name: String, dir: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // distinct filler docs: no shared 8-gram runs with the cluster texts
  private def filler(n: Int, offset: Long): Seq[(Long, String)] =
    (0 until n).map { i =>
      (offset + i,
        s"filler$i " + Seq.tabulate(20)(j => s"w${i}x$j").mkString(" "))
    }

  test("duplicate cluster under the cap is fully scored") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(1L, 2L, 3L).map(id => (id, text)) ++ filler(5, 100L)
    val dir = writeDocs(docs)
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L))
    assert(pairs("dedup_ngram_jaccard", dir) === expected)
    assert(pairs("dedup_containment", dir) === expected)
  }

  test("degenerate block over the cap is skipped, not scored n^2") {
    // 100 identical docs: every blocking key collapses to ONE block of
    // 100 > 64, which the cap drops — zero pairs instead of 4950
    val text = "boilerplate header repeated across the entire corpus body"
    val docs = (1L to 100L).map(id => (id, text)) ++ filler(5, 1000L)
    val dir = writeDocs(docs)
    assert(pairs("dedup_ngram_jaccard", dir).isEmpty)
    assert(pairs("dedup_containment", dir).isEmpty)
  }

  test("docs shorter than the 8-char blocking gram still pair") {
    val docs = Seq((1L, "hello"), (2L, "hello")) ++ filler(4, 50L)
    val dir = writeDocs(docs)
    assert(pairs("dedup_ngram_jaccard", dir) === Set((1L, 2L)))
    assert(pairs("dedup_containment", dir) === Set((1L, 2L)))
  }
}
