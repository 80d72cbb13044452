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

  // ---- dedup_rare_gram (posting-list retrieval) -------------------

  test("rare-gram retrieval: duplicate cluster under the df cap is fully scored") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(1L, 2L, 3L).map(id => (id, text)) ++ filler(5, 100L)
    val dir = writeDocs(docs)
    assert(pairs("dedup_rare_gram", dir) ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("rare-gram retrieval: grams over the df cap are dropped, not paired n^2") {
    // 20 identical docs: every shared gram has df = 20 > RareGramDfCap
    // (16) — the posting-list analogue of the degenerate-block refusal:
    // a >cap-copy cluster is exact-dedup's job, not the retrieval tail's
    val text = "boilerplate header repeated across the entire corpus body"
    val docs = (1L to 20L).map(id => (id, text)) ++ filler(5, 1000L)
    val dir = writeDocs(docs)
    assert(pairs("dedup_rare_gram", dir).isEmpty)
  }

  test("rare-gram retrieval: a single shared rare gram is not a candidate") {
    // the docs share exactly ONE width-8 window — " shrme6 ", the
    // 6-char common token plus its two spaces; every other window
    // spills into neighbor words that differ. MinSharedRareGrams = 2
    // keeps the chance single-gram collision out of the verify join
    // — and even as a candidate it could never pass J4 >= 0.6
    val docs = Seq(
      (1L, "alpha beta gamma shrme6 delta epsilon"),
      (2L, "zz1 qq2 ww3 shrme6 rr4 tt5 yy6 uu7")) ++ filler(4, 50L)
    val dir = writeDocs(docs)
    assert(pairs("dedup_rare_gram", dir).isEmpty)
  }

  test("rare-gram retrieval catches a near-dup pair blocking minima can split") {
    // doc B extends doc A with a distinct tail: if the tail owns B's
    // 8-gram minima, A and B land in different blocks and the blocking
    // dedups never compare them — but every gram of the shared prefix
    // has df = 2 (rare), so the posting lists pair them regardless of
    // where the minima land. The pair must still clear exact J4 >= 0.6,
    // so the tail stays short relative to the shared run.
    val shared = "the quick brown fox jumps over the lazy dog again " +
      "and again and once more for good measure in this long shared run"
    val a = shared
    val b = shared + " unique tiny tail"
    val dir = writeDocs(Seq((1L, a), (2L, b)) ++ filler(5, 100L))
    assert(pairs("dedup_rare_gram", dir) === Set((1L, 2L)))
  }

  // ---- dedup_incremental_near (batch-vs-corpus retrieval) ---------

  private def nearPairs(dir: String): Set[(Long, Long, Double)] =
    SparkEntry.queries("dedup_incremental_near")(spark, dir)
      .select("batch_doc", "corpus_doc", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental near: a re-crawl replay matches its corpus copy at 1.0") {
    // doc 10 sits in the corpus (< 400) AND in the batch replay window
    // (< 50): the ingest screen must pair it with itself at J4 = 1.0
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val dir = writeDocs(Seq((10L, text)) ++ filler(5, 100L))
    assert(nearPairs(dir) === Set((10L, 10L, 1.0)))
  }

  test("incremental near: a new batch doc pairs with its corpus near-dup, " +
    "corpus-internal dups do not pair") {
    val shared = "the quick brown fox jumps over the lazy dog again " +
      "and again and once more for good measure in this long shared run"
    val docs = Seq(
      (60L, shared), // corpus only (>= 50 so not replayed into batch)
      (400L, shared + " unique tiny tail"), // new batch doc, near-dup
      (70L, "corpus internal duplicate body repeated verbatim here"),
      (71L, "corpus internal duplicate body repeated verbatim here")) ++
      filler(5, 100L)
    val dir = writeDocs(docs)
    val got = nearPairs(dir)
    assert(got.map(p => (p._1, p._2)) === Set((400L, 60L)),
      s"got $got — corpus-internal pair (70,71) must NOT appear: the " +
        "ingest screen only compares batch against corpus")
    assert(got.forall(p => p._3 >= 0.6 && p._3 < 1.0))
  }

  test("incremental near: grams over the corpus df cap are refused") {
    // 20 identical corpus docs push every shared gram's df to 20 > 16;
    // a batch doc with the same text probes nothing — the >cap cluster
    // is exact-dedup's job (the replay path), not the near screen's
    val text = "boilerplate header repeated across the entire corpus body"
    val docs = (60L to 79L).map(id => (id, text)) ++
      Seq((400L, text)) ++ filler(5, 100L)
    val dir = writeDocs(docs)
    assert(nearPairs(dir).isEmpty)
  }
}
