package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** NULL-text semantics for the dedup family. The driver corpus has no
  * NULL text, so the oracle gate can never catch a null-handling
  * divergence — these tests pin the semantics the engine ships with: a
  * NULL-keyed incoming row is NOVEL (anti-join / NOT EXISTS keep it;
  * `NOT IN` would silently drop every row once any historical hash is
  * NULL — the trap the bloom-prefilter verification branch fixed).
  */
class NullSafetySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a documents.parquet with the given (doc_id, text) rows into a
    * fresh temp dir shaped like a testdata sf directory.
    */
  private def corpus(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-null").toString
    val data = rows.map { case (id, t) =>
      Row(id, t, "en", s"src${id % 3}",
        if (t == null) 0L else t.length.toLong)
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(data: _*)),
        docSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("incremental dedup keeps NULL-text incoming rows (anti-join " +
      "semantics, not NOT IN)") {
    // historical = doc_id < 400 (includes a NULL text); incoming =
    // doc_id >= 400 plus the replay range < 50. A NULL-text row can
    // never equal any historical hash, so it must survive — and a NULL
    // in the HISTORICAL side must not nuke the whole batch the way
    // NOT IN would.
    val d = corpus(
      0L -> "alpha", 1L -> "beta", 2L -> null, // replayed AND historical
      100L -> "gamma", // historical only
      400L -> "alpha", // exact replay of doc 0 -> dropped
      401L -> "delta", // genuinely new -> kept
      402L -> null) // new with NULL text -> kept
    val kept = graft.operators.TextQueries.incrementalDedup(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 401L, 402L))
  }

  test("bloom-prefiltered dedup keeps NULL-text batch rows even when " +
      "the corpus also has a NULL (verification is NOT EXISTS)") {
    // batch = doc_id % 7 == 0. xxhash64(NULL) is the seed constant, so
    // with a NULL in BOTH corpus and batch the batch row is guaranteed
    // bloom-positive — the verification branch must still keep it,
    // because no corpus md5 EQUALS the row's NULL hash.
    val d = corpus(
      0L -> null, // batch, NULL text -> bloom-positive, must be kept
      1L -> "dup", // corpus
      7L -> "dup", // batch, true duplicate -> dropped
      8L -> null, // corpus NULL: forces xxhash64(NULL) into the bloom
      14L -> "novel") // batch, genuinely new -> kept
    val kept = graft.operators.TextQueries.bloomPrefilter(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L, 14L))
  }

  test("bag dedup groups NULL and empty texts as the empty bag") {
    // split(NULL) -> null array, filter/sort keep it null, and
    // concat_ws treats a null array as empty — so NULL text and ""
    // canonicalize to the same empty bag instead of crashing or
    // silently dropping rows.
    val d = corpus(
      0L -> "a b c",
      1L -> "c b a", // token-reordered rewrite of doc 0
      2L -> null,
      3L -> "")
    val rows = graft.operators.TextQueries.bagDedup(spark, d)
      .select("doc_id", "n_bag", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows == Seq(
      (0L, 2L, true), (1L, 2L, false), // reordered pair collapses
      (2L, 2L, true), (3L, 2L, false))) // NULL and "" share the empty bag
  }
}
