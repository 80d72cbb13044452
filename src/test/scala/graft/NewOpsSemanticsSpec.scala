package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics of the round-10 additions, pinned at the result level
  * on purpose-built corpora (the sf0.01 DuckDB gate certifies the bulk
  * values; these are the boundary cases a bulk corpus may never hit):
  *
  *   - text_chunk_overlap: window/stride arithmetic at the boundaries —
  *     short doc, exact-fit doc, trailing clamp, overlap width;
  *   - text_zipf_fit: a synthetic corpus with EXACT Zipf counts fits
  *     slope ≈ −1;
  *   - dedup_source_overlap: pair completeness incl. zero-overlap
  *     pairs, containment vs jaccard bounds, sub-shingle-length docs;
  *   - vec_semantic_dedup: keep-earliest rule, threshold edge, and the
  *     scale-adaptive cluster count actually growing past the IVF 16
  *     when the corpus demands it.
  */
class NewOpsSemanticsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = tmp("newops")
    import spark.implicits._
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- text_chunk_overlap -------------------------------------------

  private def chunks(dir: String, docId: Long): Seq[(Long, Long, Int, String)] =
    SparkEntry.queries("text_chunk_overlap")(spark, dir)
      .filter(col("doc_id") === docId)
      .select("chunk_id", "start_tok", "n_chunk_toks", "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))).toSeq

  test("chunking: doc shorter than one window yields exactly one full-doc chunk") {
    val dir = writeDocs(Seq((1L, "s", (1 to 5).map(i => s"t$i").mkString(" "))))
    assert(chunks(dir, 1L) === Seq((0L, 1L, 5, "t1 t2 t3 t4 t5")))
  }

  test("chunking: exact one-window doc (32 tokens) yields one chunk, not two") {
    val dir = writeDocs(Seq((1L, "s", (1 to 32).map(i => s"t$i").mkString(" "))))
    val c = chunks(dir, 1L)
    assert(c.map(x => (x._1, x._2, x._3)) === Seq((0L, 1L, 32)))
  }

  test("chunking: 33 tokens spills into a clamped second chunk with 8-token overlap") {
    val toks = (1 to 33).map(i => s"t$i")
    val dir = writeDocs(Seq((1L, "s", toks.mkString(" "))))
    val c = chunks(dir, 1L)
    // ceil((33-32)/24)+1 = 2 chunks; second starts at token 25, carries
    // the remaining 9 tokens (t25..t33) — 8 of them shared with chunk 0
    assert(c.map(x => (x._1, x._2, x._3)) === Seq((0L, 1L, 32), (1L, 25L, 9)))
    assert(c(1)._4 === (25 to 33).map(i => s"t$i").mkString(" "))
    val overlap = c(0)._4.split(" ").toSet intersect c(1)._4.split(" ").toSet
    assert(overlap.size === 8)
  }

  test("chunking: every token position is covered and strides are uniform") {
    val n = 100
    val dir = writeDocs(Seq((1L, "s", (1 to n).map(i => s"t$i").mkString(" "))))
    val c = chunks(dir, 1L)
    assert(c.size === 4) // ceil((100-32)/24)+1
    assert(c.map(_._2) === Seq(1L, 25L, 49L, 73L))
    val covered = c.flatMap(x => x._2 until (x._2 + x._3)).toSet
    assert(covered === (1L to n.toLong).toSet)
  }

  // ---- text_zipf_fit ------------------------------------------------

  test("zipf fit recovers slope -1 on an exactly Zipfian corpus") {
    // term k appears floor(1200/k) times => ln(count) = ln(1200) - ln(rank)
    val words = (1 to 300).flatMap(k => Seq.fill(1200 / k)(s"w%03d".format(k)))
    val dir = writeDocs(words.grouped(40).zipWithIndex.map {
      case (g, i) => (i.toLong, "s", g.mkString(" "))
    }.toSeq)
    val r = SparkEntry.queries("text_zipf_fit")(spark, dir).head()
    val (n, slope) = (r.getAs[Long]("n_terms"), r.getAs[Double]("slope"))
    assert(n === 256) // top-K cut of the 300-term vocabulary
    // floor() quantization keeps this within a few percent of -1
    assert(math.abs(slope - (-1.0)) < 0.05, s"slope=$slope")
  }

  // ---- dedup_source_overlap -----------------------------------------

  test("source overlap: complete pair grid, zero-overlap rows, bounds") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val dir = writeDocs(Seq(
      (1L, "a", shared),
      (2L, "b", shared + " eta theta"),
      (3L, "c", "one two three four five six"), // disjoint from a, b
      (4L, "d", "xy")))                         // < 3 tokens: no shingle
    val rows = SparkEntry.queries("dedup_source_overlap")(spark, dir)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_common"),
        r.getAs[Double]("jaccard"), r.getAs[Double]("containment")))
    // source d contributes no shingles, so the grid is over {a,b,c}
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rows.find(t => (t._1, t._2) == ("a", "b")).get
    // a's 4 shingles are all contained in b's 6
    assert((ab._3, ab._4, ab._5) === (4L, 6L, 4L))
    assert(ab._7 === 1.0) // containment of the smaller source
    assert(ab._6 === math.rint(4.0 / 6.0 * 1e6) / 1e6)
    val ac = rows.find(t => (t._1, t._2) == ("a", "c")).get
    assert(ac._5 === 0L && ac._6 === 0.0 && ac._7 === 0.0)
  }

  // ---- vec_semantic_dedup -------------------------------------------

  private val Dim = 64

  /** Unit basis-ish vectors: axis a with a tiny deterministic nudge so
    * cosine(same-axis pair) ≈ 1 and cosine(cross-axis) ≈ 0.
    */
  private def writeVecs(n: Int, axes: Int => Int): String = {
    val dir = tmp("semvec")
    import spark.implicits._
    (0 until n).map { i =>
      val a = axes(i) % Dim
      (i.toLong, Array.tabulate(Dim)(j => if (j == a) 1.0f else 0.0f), a)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("semantic dedup: keep-earliest within a cluster, keep across clusters") {
    // 20 vectors on 5 axes, 4 per axis: identical same-axis vectors are
    // cosine-1 duplicates; the earliest id per axis must be the only
    // keeper of its group
    val dir = writeVecs(20, i => i % 5)
    val rows = SparkEntry.queries("vec_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Boolean]("keep"),
        r.getAs[Double]("max_prior_sim"))).toSeq
    assert(rows.size === 20)
    rows.foreach { case (id, keep, prior) =>
      if (id < 5) assert(keep && prior <= 0.4, s"first-of-axis $id")
      else assert(!keep && prior === 1.0, s"later duplicate $id")
    }
  }

  test("semantic dedup: cluster count scales past the fixed IVF 16") {
    // 1200 vectors => k = ceil(1200/64) = 19 > 16; spreading them over
    // 19+ axes keeps assignments non-degenerate
    val dir = writeVecs(1200, i => i % 24)
    val lists = SparkEntry.queries("vec_semantic_dedup")(spark, dir)
      .select(countDistinct("list_id")).head().getLong(0)
    assert(lists > 16L, s"expected adaptive k>16 clusters, got $lists")
  }

  // ---- dedup_substring ----------------------------------------------

  private def substr(dir: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("dedup_substring")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"),
          r.getAs[Double]("dup_ratio")))).toMap

  private def words(from: Int, n: Int): String =
    (from until from + n).map(i => s"w$i").mkString(" ")

  test("substring dedup: doc shorter than one window surfaces with 0 windows") {
    val dir = writeDocs(Seq((1L, "s", words(0, 19)), (2L, "s", words(100, 25))))
    val m = substr(dir)
    assert(m(1L) === ((0L, 0L, 0.0)))
    assert(m(2L)._1 === 1L) // 25 tokens, stride 10: only p=0 fits fully...
  }

  test("substring dedup: exactly-20-token doc yields one window") {
    val dir = writeDocs(Seq((1L, "s", words(0, 20))))
    assert(substr(dir)(1L) === ((1L, 0L, 0.0)))
  }

  test("substring dedup: an aligned copied passage is flagged in BOTH docs") {
    // doc 1 = tokens a0..a39; doc 2 = its first 20 tokens verbatim then
    // 20 unrelated ones; doc 3 fully unrelated. Window p=0 of docs 1+2
    // hash equal => one dup window each; every other window unique.
    val shared = words(0, 20)
    val dir = writeDocs(Seq(
      (1L, "s", shared + " " + words(1000, 20)),
      (2L, "s", shared + " " + words(2000, 20)),
      (3L, "s", words(3000, 40))))
    val m = substr(dir)
    assert(m(1L) === ((3L, 1L, round6(1.0 / 3))))
    assert(m(2L) === ((3L, 1L, round6(1.0 / 3))))
    assert(m(3L) === ((3L, 0L, 0.0)))
  }

  test("substring dedup: a window repeated only WITHIN one doc is not a dup") {
    // 40 tokens = the same 10-token phrase ×4: windows at p=0,10,20 all
    // hash identical, but min(doc_id)==max(doc_id) per hash
    val phrase = words(0, 10)
    val dir = writeDocs(Seq((1L, "s", Seq.fill(4)(phrase).mkString(" "))))
    assert(substr(dir)(1L) === ((3L, 0L, 0.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- train_sampling_temperature -----------------------------------

  test("sampling temperature: 1:4 token split gives exact 1/3-2/3 at α=0.5") {
    // sqrt(0.8) = 2·sqrt(0.2), so weights are exactly 1/3 and 2/3;
    // α=0.25 flattens further: ratio 4^0.25 = sqrt(2) => 1/(1+sqrt 2)
    val dir = writeDocs(Seq(
      (1L, "a", words(0, 100)), (2L, "b", words(0, 400))))
    val rows = SparkEntry.queries("train_sampling_temperature")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("p_natural"), r.getAs[Double]("w_alpha50"),
          r.getAs[Double]("w_alpha25"), r.getAs[Long]("docs_per_10k_a50"))))
      .toMap
    val (pa, wa50, wa25, da) = rows("a")
    val (pb, wb50, wb25, db) = rows("b")
    assert((pa, pb) === ((0.2, 0.8)))
    assert((wa50, wb50) === ((0.333333, 0.666667)))
    assert((wa25, wb25) === ((round6(1 / (1 + math.sqrt(2))),
      round6(math.sqrt(2) / (1 + math.sqrt(2))))))
    assert((da, db) === ((3333L, 6667L)))
    // temperature flattens monotonically: p < w(α=.5) < w(α=.25) < 0.5
    // for the minority source, reversed for the majority
    assert(pa < wa50 && wa50 < wa25 && wa25 < 0.5)
    assert(pb > wb50 && wb50 > wb25 && wb25 > 0.5)
  }

  // ---- text_bpe_pairs -----------------------------------------------

  test("bpe pairs: frequency-weighted adjacent-pair counts rank the true merge") {
    // words: banana ×2, band ×1. Pair 'an' occurs at 2 positions in
    // banana (freq 2 → weight 4) + 1 in band → count 5, 3 positions;
    // 'na' 4/2; 'ba' 3/2; 'nd' 1/1.
    val dir = writeDocs(Seq((1L, "s", "banana banana band")))
    val rows = SparkEntry.queries("text_bpe_pairs")(spark, dir)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("pair"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("n_positions"))).toSeq
    assert(rows === Seq(
      (1L, "an", 5L, 3L), (2L, "na", 4L, 2L),
      (3L, "ba", 3L, 2L), (4L, "nd", 1L, 1L)))
  }

  test("bpe pairs: single-char words carry no pairs") {
    val dir = writeDocs(Seq((1L, "s", "a b c ab")))
    val rows = SparkEntry.queries("text_bpe_pairs")(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("pair"),
      r.getAs[Long]("pair_count"))).toSeq === Seq(("ab", 1L)))
  }

  // ---- text_bpe_merge2 ----------------------------------------------

  test("bpe merge2: applying the top merge reshapes round-2 pair counts") {
    // r1 top merge = 'an' (count 5). banana → b§§a, band → b§d.
    // r2 pairs (freq-weighted): b§=3, §a=2, §§=2, §d=1; ties break on
    // the ENCODED pair bytes ('a' < '§' in UTF-8), and pairs decode
    // with the marker expanded back to the merged symbol.
    val dir = writeDocs(Seq((1L, "s", "banana banana band")))
    val rows = SparkEntry.queries("text_bpe_merge2")(spark, dir)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("pair"),
        r.getAs[Long]("pair_count"), r.getAs[Boolean]("contains_merge"))).toSeq
    assert(rows === Seq(
      (1L, "ban", 3L, true), (2L, "ana", 2L, true),
      (3L, "anan", 2L, true), (4L, "and", 1L, true)))
  }

  test("bpe merge2: a word equal to the merge pair vanishes from round 2") {
    // top pair 'ab' (freq 3); the standalone word 'ab' merges to the
    // 1-char marker and carries no round-2 pairs; 'abc' → §c survives
    val dir = writeDocs(Seq((1L, "s", "ab ab ab abc xy")))
    val rows = SparkEntry.queries("text_bpe_merge2")(spark, dir)
      .collect().map(r => (r.getAs[String]("pair"),
        r.getAs[Long]("pair_count"), r.getAs[Boolean]("contains_merge"))).toSeq
    assert(rows === Seq(("xy", 1L, false), ("abc", 1L, true)))
  }

  // ---- rel_gap_fill -------------------------------------------------

  test("gap fill: empty buckets surface zero-filled with the total carried") {
    // events in 10-min buckets 0 and 2 only; bucket 1 must appear as a
    // zero row with is_gap=true and the running total carried across
    val dir = tmp("gapfill")
    import spark.implicits._
    Seq((1L, 0L, 1.00), (2L, 100L * 1000000000L, 2.50),
      (3L, 1250L * 1000000000L, 0.75))
      .toDF("event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("rel_gap_fill")(spark, dir)
      .collect().map(r => (r.getAs[Long]("n_events"),
        r.getAs[Long]("sum_cents"), r.getAs[Boolean]("is_gap"),
        r.getAs[Long]("cum_cents"))).toSeq
    assert(rows === Seq(
      (2L, 350L, false, 350L), (0L, 0L, true, 350L),
      (1L, 75L, false, 425L)))
  }

  // ---- train_split_assign -------------------------------------------

  test("split assign: partitions every doc, shares sum to 1, and is growth-stable") {
    val base = (0L until 200L).map(i => (i, s"s${i % 2}", words(i.toInt, 30)))
    // corpus B adds 200 NEW docs under DISJOINT sources: the rows for
    // the original sources must be byte-identical — the salted doc_id
    // hash keeps assignments stable under growth, the property a
    // random()/row_number split loses
    val dirA = writeDocs(base)
    val dirB = writeDocs(base ++ (200L until 400L).map(i =>
      (i, s"s${2 + i % 2}", words(i.toInt, 30))))
    def splits(dir: String): Seq[(String, String, Long, Long, Double)] =
      SparkEntry.queries("train_split_assign")(spark, dir)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("split"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("tok_share"))).toSeq
    val a = splits(dirA)
    assert(a.map(_._3).sum === 200L) // every doc lands in exactly one split
    assert(a.map(_._2).distinct.sorted === Seq("test", "train", "val"))
    a.groupBy(_._1).foreach { case (src, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-5, s"shares of $src")
    }
    val b = splits(dirB)
    assert(b.filter(r => r._1 == "s0" || r._1 == "s1") === a)
    assert(b.map(_._3).sum === 400L)
  }

  // ---- train_epoch_plan ---------------------------------------------

  test("epoch plan: uniform budget split yields exact per-source epoch counts") {
    // 2 sources, 100 vs 400 tokens; 1M budget → 500k each → epochs
    // 5000.0 / 1250.0, both oversampled (the memorization-risk flag)
    val dir = writeDocs(Seq((1L, "a", words(0, 100)), (2L, "b", words(0, 400))))
    val rows = SparkEntry.queries("train_epoch_plan")(spark, dir)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("budget_tokens"), r.getAs[Double]("epochs"),
        r.getAs[Boolean]("oversampled"))).toSeq
    assert(rows === Seq(
      ("a", 500000L, 5000.0, true), ("b", 500000L, 1250.0, true)))
  }

  // ---- cdc_reorder_audit --------------------------------------------

  test("reorder audit: lateness histogram detects disorder, clean keys stay zero") {
    // user 1 arrives disordered: ts 100s, 50s, 99s → lateness 0, 50s
    // (bucket 26: 2^25 < 5e7 ≤ 2^26), 1s (bucket 20); user 2 in order
    val dir = tmp("reorder")
    import spark.implicits._
    val S = 1000000000L // ns per second
    Seq((1L, 1L, 100L * S), (2L, 1L, 50L * S), (3L, 1L, 99L * S),
      (4L, 2L, 10L * S), (5L, 2L, 20L * S))
      .toDF("event_id", "user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("cdc_reorder_audit")(spark, dir)
      .collect().map(r => (r.getAs[Long]("late_log2_bucket"),
        r.getAs[Long]("n_events"), r.getAs[Long]("max_late_us"),
        r.getAs[Long]("sum_late_us"))).toSeq
    assert(rows === Seq(
      (0L, 3L, 0L, 0L),
      (20L, 1L, 1000000L, 1000000L),
      (26L, 1L, 50000000L, 50000000L)))
  }

  // ---- media_shape_buckets ------------------------------------------

  test("shape buckets: exact pixel math and shares over the derived shape grid") {
    // doc_ids 0..9 produce 10 distinct (width, height) shapes; the
    // global max resolution is 176x112 COMPOSED from different assets
    // (widest is 176x80, tallest 128x112), so even the widest asset
    // pays padding — the exact semantic a per-axis max must expose
    val dir = writeDocs((0L to 9L).map(i => (i, "s", s"media doc $i")))
    val rows = SparkEntry.queries("media_shape_buckets")(spark, dir)
      .collect().map(r => ((r.getAs[Int]("width"), r.getAs[Int]("height")),
        (r.getAs[Long]("n_assets"), r.getAs[Long]("pad_px_to_max"),
          r.getAs[Double]("share")))).toMap
    assert(rows.size === 10)
    assert(rows((64, 48)) === ((1L, 16640L, 0.1)))   // 176*112 - 64*48
    assert(rows((176, 80)) === ((1L, 5632L, 0.1)))   // 176*112 - 176*80
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-9)
  }

  // ---- train_length_buckets -----------------------------------------

  test("length buckets: integer bit-math bucketing is exact at powers of two") {
    // token counts 1,2,3,4,5,64,65 → buckets 1,2,4,4,8,64,128: an
    // exact-power doc must land in ITS OWN size, not the next decade
    val dir = writeDocs(Seq(
      (1L, "s", words(0, 1)), (2L, "s", words(0, 2)), (3L, "s", words(0, 3)),
      (4L, "s", words(0, 4)), (5L, "s", words(0, 5)),
      (6L, "s", words(0, 64)), (7L, "s", words(0, 65))))
    val rows = SparkEntry.queries("train_length_buckets")(spark, dir)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tokens"), r.getAs[Long]("pad_waste"))).toSeq
    assert(rows === Seq(
      (1L, 1L, 1L, 0L), (2L, 1L, 2L, 0L), (4L, 2L, 7L, 1L),
      (8L, 1L, 5L, 3L), (64L, 1L, 64L, 0L), (128L, 1L, 65L, 63L)))
  }

  // ---- vec_trunc_recall ---------------------------------------------

  test("trunc recall: prefix-only impostors depress recall@10 at dim 8 only") {
    // q (vec 0) = all-ones. ids 1..5: first 8 dims = q, rest = -1 —
    // prefix-8 cosine 1 (ties won by low vec_id), prefix-16 cosine 0,
    // full cosine -0.75. ids 6..15: identical to q everywhere. Exact
    // top-10 = {6..15}; dim-8 top-10 = {1..10} => 5 hits; dims 16/32
    // already rank the true neighbors first.
    val dir = tmp("trunc")
    import spark.implicits._
    ((0L, Array.fill(Dim)(1.0f), 0) +:
      (1 to 5).map(i =>
        (i.toLong, Array.tabulate(Dim)(j => if (j < 8) 1.0f else -1.0f), 1)) ++:
      (6 to 15).map(i => (i.toLong, Array.fill(Dim)(1.0f), 2)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("vec_trunc_recall")(spark, dir)
      .collect().map(r => (r.getAs[Int]("dim"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall_at_10"))).toSeq
    assert(rows === Seq((8, 5L, 0.5), (16, 10L, 1.0), (32, 10L, 1.0)))
  }

  // ---- rel_anomaly_zscore -------------------------------------------

  test("anomaly zscore: one planted spike flags at both 3σ and 5σ; " +
    "a zero-variance type flags nothing (division-free z² form)") {
    val dir = tmp("anomaly")
    import spark.implicits._
    // type a: 100 quiet rows + one 1000.0 spike (z ≈ 9.9); type b:
    // constant — σ = 0 makes a naive z = dev/σ divide by zero, while the
    // cross-multiplied form 0 > 0 is simply false for every row
    val rows = ((1 to 100).map(i => (i.toLong, i.toLong * 1000000000L, "a", 10.0)) ++
      Seq((101L, 101L * 1000000000L, "a", 1000.0)) ++
      (1 to 8).map(i => (200L + i, (200L + i) * 1000000000L, "b", 42.5)))
      .toDF("event_id", "ts", "event_type", "value")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("rel_anomaly_zscore")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_out3"),
        r.getAs[Long]("n_out5"), r.getAs[Long]("sum_out_v_micro"))).toSeq
    assert(got === Seq(("a", 101L, 1L, 1L, 1000000000L),
      ("b", 8L, 0L, 0L, 0L)))
  }

  // ---- media_phash_neardup ------------------------------------------

  test("phash neardup: the pipeline surfaces exactly the DCT-hash pairs " +
    "within the Hamming radius") {
    // groups {0,1,2} and {3,4,5}: anchor is the canonical encode
    // (variant 0); members 1/2 are ±2-pixel-jitter re-encodes of the
    // SAME source bytes. Expected pairs are derived here straight from
    // DctHashUtil.hash (the expression under test is pinned
    // cross-engine by the oracle; THIS test pins the pipeline around
    // it: grouping, banding, radius filter, ordering) — any ≤2-bit
    // pair must survive the 3×20-bit banding by pigeonhole.
    import org.apache.spark.unsafe.types.UTF8String
    val anchorText = Map(
      0L -> "the quick brown fox jumps over the lazy dog",
      3L -> "a completely different source payload for group two")
    val dir = writeDocs(Seq(
      (0L, "s", anchorText(0L)),
      (1L, "s", "ignored - reads the anchor's bytes"),
      (2L, "s", "ignored - reads the anchor's bytes"),
      (3L, "s", anchorText(3L)),
      (4L, "s", "ignored"), (5L, "s", "ignored")))
    def h(id: Long): Long = graft.plans.DctHashUtil.hash(
      UTF8String.fromString(anchorText(id - id % 3)), id % 3)
    val ids = 0L to 5L
    val expected = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= 2
    } yield (a, b, d)).sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("media_phash_neardup")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming"))).toSeq
    assert(got === expected)
    // the jitter produces REAL near-dups: at least one variant pair
    // lands inside the radius, and none collapses to a cross-group pair
    assert(expected.nonEmpty)
    expected.foreach { case (a, b, _) => assert(a / 3 == b / 3) }
  }

  // ---- rel_funnel_windowed ------------------------------------------

  test("windowed funnel: strict ordering, window boundary, first-touch") {
    // the sf0.01 gate certifies bulk values; this corpus hits the four
    // boundary rules a bulk corpus may never isolate:
    //   u1: a click TIED with the view must not convert (strict >), a
    //       purchase BEFORE the first qualifying click must not count,
    //       the earliest qualifying events win (first-touch lags)
    //   u2: a click past view+7d is outside the window
    //   u3: clicks/purchases without any view never enter the funnel
    //   u4: a click exactly AT view+7d is inside (<= boundary); its
    //       purchase at +7d+1h is outside
    val dir = tmp("funnelw")
    import spark.implicits._
    val t0 = 1000000000000000000L // ns
    val h = 3600L * 1000000000L   // 1 hour in ns
    val d7 = 7L * 24L * h         // the FunnelWindow in ns
    val rows = Seq(
      (1L, t0, 10L, "view", 1.0),
      (2L, t0, 10L, "click", 1.0),          // tie with view: excluded
      (3L, t0 + h, 10L, "click", 1.0),      // t2 = +1h
      (4L, t0 + h / 2, 10L, "purchase", 1.0), // before t2: excluded
      (5L, t0 + 2 * h, 10L, "purchase", 1.0), // t3 = +2h
      (6L, t0, 20L, "view", 1.0),
      (7L, t0 + d7 + h, 20L, "click", 1.0), // outside window
      (8L, t0 + h, 30L, "click", 1.0),      // no view: not in funnel
      (9L, t0 + 2 * h, 30L, "purchase", 1.0),
      (10L, t0, 40L, "view", 1.0),
      (11L, t0 + d7, 40L, "click", 1.0),    // exactly at boundary: in
      (12L, t0 + d7 + h, 40L, "purchase", 1.0)) // past boundary: out
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("rel_funnel_windowed")(spark, dir)
      .collect().map(r => (r.getAs[String]("stage"),
        r.getAs[Long]("n_users"), r.getAs[Long]("sum_lag_us"))).toSeq
    val usH = 3600L * 1000000L
    assert(got === Seq(
      ("1_view", 3L, 0L),                       // u1, u2, u4
      ("2_click", 2L, usH + 7L * 24L * usH),    // u1 (+1h), u4 (+7d)
      ("3_purchase", 1L, usH)))                 // u1 only (+1h from t2)
  }
}
