package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Pins Bpe.train's full-loop semantics against an independent plain
  * Scala BPE implementation (the CrossOperatorSpec trained-quantizer
  * pattern): same word-form weighting, same (count DESC, pair ASC)
  * tie-break, same greedy left-to-right merge application, same
  * marker/decode scheme — derived here with mutable maps and
  * String.replace, no Spark.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def wordsDf = {
    graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  private def inMemoryTrain(words: Seq[(String, Long)], k: Int)
      : Seq[(Long, String, Long)] = {
    var vocab = words
    var merges = Vector.empty[(Int, String, Long)]
    var r = 0
    while (r < k) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- vocab if w.length >= 2; i <- 0 until w.length - 1) {
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      assert(counts.nonEmpty, s"vocabulary exhausted at round $r")
      val (mp, c) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      val mk = (0xE000 + r).toChar.toString
      // String.replace = all non-overlapping occurrences left-to-right,
      // exactly SQL replace() = greedy BPE merge application
      vocab = vocab.map { case (w, f) => w.replace(mp, mk) -> f }
      merges = merges :+ ((r + 1, mp, c))
      r += 1
    }
    def decode(s0: String): String =
      merges.sortBy(-_._1).foldLeft(s0) { (acc, m) =>
        acc.replace((0xE000 + m._1 - 1).toChar.toString, m._2)
      }
    merges.map { case (rank, p, c) => (rank.toLong, decode(p), c) }
  }

  test("Bpe.train matches an independent in-memory BPE over 8 merges") {
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = inMemoryTrain(words, 8)
    val got = Bpe.train(spark, wordsDf, 8)
      .map(m => (m.rank.toLong, m.decoded, m.count))
    assert(got == expected, s"got=$got\nexpected=$expected")
  }

  test("merges are well-formed: ranks sequential, decoded pairs expand markers") {
    val merges = Bpe.train(spark, wordsDf, 4)
    assert(merges.map(_.rank) == (1 to merges.size))
    merges.foreach { m =>
      assert(!m.decoded.exists(c => c >= 0xE000 && c <= 0xF8FF),
        s"undecoded marker in ${m.decoded}")
      assert(m.decoded.length >= 2)
      assert(m.count > 0)
    }
    // rank-1 merge is the most frequent raw pair: its decoded form IS
    // its raw form (no markers can exist yet)
    assert(merges.head.pair == merges.head.decoded)
  }

  test("deep training run: K=48 stays correct and leaks no cached state") {
    // Regression for the two round-lifecycle failures a K=256 run
    // exposed (SCALING.md §Bpe.train): chained persist-per-round leaked
    // ~200 MB of plan metadata PER ROUND (8 GiB OOM by round ~20 over a
    // 31-row vocabulary), and the r-deep RDD DAG then overflowed task
    // deserialization at round ~150. Deep-ish K over a synthetic
    // vocabulary that sustains it; correctness pinned against the
    // independent in-memory trainer, lifecycle pinned by the
    // persistent-RDD census returning to its pre-train snapshot
    // (exactly two generations live DURING training is unobservable
    // from here; zero NEW ones after it is the contract's boundary).
    val rng = new scala.util.Random(7)
    val words = Seq.tabulate(24) { i =>
      val w = (0 until 12).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
      (w, (i % 7 + 1).toLong)
    }
    val df = spark.createDataFrame(words).toDF("word", "freq")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val expected = inMemoryTrain(words, 48)
    val got = Bpe.train(spark, df, 48)
      .map(m => (m.rank.toLong, m.decoded, m.count))
    assert(got == expected)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"train leaked persisted RDDs: $leaked")
  }

  test("PUA preconditions are enforced loudly") {
    // k past the BMP private-use area is rejected before any work
    val ok = spark.createDataFrame(Seq(("ab", 1L))).toDF("word", "freq")
    val e1 = intercept[IllegalArgumentException] { Bpe.train(spark, ok, 6401) }
    assert(e1.getMessage.contains("6400"))
    // corpus text already containing a PUA char collides with markers —
    // rejected after one vocabulary-bounded scan, not silently merged
    val pua = spark.createDataFrame(
      Seq(("ab", 2L), ("c" + 0xE005.toChar + "d", 1L))).toDF("word", "freq")
    val e2 = intercept[IllegalArgumentException] { Bpe.train(spark, pua, 2) }
    assert(e2.getMessage.contains("private-use"))
  }

  test("bpeEncode emits the in-memory per-doc token count and head ids") {
    // independent leg: train raw merges in memory (same loop as the
    // apply test), encode each doc by per-word chained replace, map
    // symbols to ids (code point; marker U+E000+j -> 0x110000+j, above
    // every Unicode code point so merge ids never collide with base
    // chars; the gate is the EXACT K-marker range, not >= U+E000)
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab = words
    var raw = Vector.empty[String]
    for (r <- 0 until 8) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- vocab if w.length >= 2; i <- 0 until w.length - 1) {
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      val (mp, _) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      vocab = vocab.map { case (w, f) =>
        w.replace(mp, (0xE000 + r).toChar.toString) -> f
      }
      raw = raw :+ mp
    }
    def encodeWord(w0: String): String =
      raw.zipWithIndex.foldLeft(w0) { case (w, (mp, r)) =>
        w.replace(mp, (0xE000 + r).toChar.toString)
      }
    def idOf(c: Char): Int =
      if (c >= 0xE000 && c < 0xE000 + 8) c.toInt - 0xE000 + 0x110000
      else c.toInt
    val expected = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val syms = r.getString(1).split(" ").filter(_.nonEmpty)
          .map(encodeWord).mkString("")
        (r.getLong(0), syms.length.toLong,
          syms.take(16).map(c => idOf(c).toString).mkString(","))
      }.sortBy(_._1).toSeq
    val got = graft.operators.TextQueries.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("bpeVocab matches an in-memory vocab export") {
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab = words
    var raw = Vector.empty[String]
    for (r <- 0 until 8) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- vocab if w.length >= 2; i <- 0 until w.length - 1) {
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      val (mp, _) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      vocab = vocab.map { case (w, f) =>
        w.replace(mp, (0xE000 + r).toChar.toString) -> f
      }
      raw = raw :+ mp
    }
    def decode(s0: String): String =
      (raw.size - 1 to 0 by -1).foldLeft(s0) { (acc, r) =>
        acc.replace((0xE000 + r).toChar.toString, raw(r))
      }
    val freq = scala.collection.mutable.Map[Char, Long]()
    graft.Tables.documents(spark, sf).select("text").collect().foreach { r =>
      val syms = raw.zipWithIndex.foldLeft(r.getString(0)) {
        case (t, (mp, j)) => t.replace(mp, (0xE000 + j).toChar.toString)
      }.replace(" ", "")
      syms.foreach(c => freq(c) = freq.getOrElse(c, 0L) + 1)
    }
    val expected = freq.toSeq.map { case (c, n) =>
      val isMarker = c >= 0xE000 && c < 0xE000 + 8
      val id = if (isMarker) c.toInt - 0xE000 + 0x110000 else c.toInt
      val form = if (isMarker) decode(c.toString) else c.toString
      val kind = if (isMarker) "merge" else "base"
      (id, form, kind, n)
    }.sortBy(_._1)
    val got = graft.operators.TextQueries.bpeVocab(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("bpeApply matches an in-memory application of the trained merges") {
    // train in memory, keeping RAW (marker-bearing) pairs — apply
    // needs them in rank order, not the decoded surface forms
    val words = wordsDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab = words
    var raw = Vector.empty[String]
    for (r <- 0 until 8) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- vocab if w.length >= 2; i <- 0 until w.length - 1) {
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      val (mp, _) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      vocab = vocab.map { case (w, f) =>
        w.replace(mp, (0xE000 + r).toChar.toString) -> f
      }
      raw = raw :+ mp
    }
    var cur: Seq[String] = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0)).toSeq
    var expTotals = Vector(cur.map(_.length.toLong).sum)
    raw.zipWithIndex.foreach { case (mp, r) =>
      cur = cur.map(_.replace(mp, (0xE000 + r).toChar.toString))
      expTotals = expTotals :+ cur.map(_.length.toLong).sum
    }
    val got = graft.operators.TextQueries.bpeApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L to 8L))
    got.foreach { case (rank, total, saved) =>
      assert(total == expTotals(rank.toInt),
        s"rank $rank: got $total expected ${expTotals(rank.toInt)}")
      assert(saved == expTotals(0) - total)
    }
  }
}
