package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics of the retrieval operators (text_inverted_index,
  * text_bm25, text_collocations) on purpose-built corpora. The sf0.01
  * DuckDB gate certifies bulk values; these pin the behaviors a bulk
  * corpus may never isolate:
  *
  *   - inverted index: the two-level (term, doc_id mod 16) tournament
  *     must return the GLOBAL 10 smallest doc_ids even when they all
  *     land in one salt group, and df/total_tf must be uncapped;
  *   - bm25: absent-term docs never score, higher tf wins at equal
  *     length, shorter doc wins at equal tf (length normalization);
  *   - collocations: PMI matches the closed-form value exactly (after
  *     round 6) and the c_xy >= 5 support threshold excludes rare
  *     pairs.
  */
class RetrievalOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = tmp("retrieval")
    import spark.implicits._
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- text_inverted_index ------------------------------------------

  test("inverted index: postings capped at the 10 smallest doc_ids, df/tf uncapped") {
    // 40 docs all containing "common"; even docs contain it twice
    val dir = writeDocs((0L until 40L).map(i =>
      (i, "s", if (i % 2 == 0) s"common common u$i" else s"common u$i")))
    val row = SparkEntry.queries("text_inverted_index")(spark, dir)
      .filter(col("term") === "common").collect().head
    assert(row.getAs[String]("postings") === (0L until 10L).mkString(" "))
    assert(row.getAs[Long]("df") === 40L)
    assert(row.getAs[Long]("total_tf") === 60L) // 20*2 + 20*1
  }

  test("inverted index: tournament survives all-minima-in-one-salt-group") {
    // the 10 global smallest ids are 0,16,...,144 — every one of them
    // ≡ 0 mod 16, so they all collapse into ONE level-1 salt group; a
    // broken tournament (e.g. one keeping only a few per salt) would
    // leak larger ids from other groups into the final postings
    val small = (0L until 10L).map(_ * 16L) // salt group 0
    val large = (1000L until 1030L)         // spread over other salts
    val dir = writeDocs((small ++ large).map(i => (i, "s", "pivot")))
    val row = SparkEntry.queries("text_inverted_index")(spark, dir)
      .filter(col("term") === "pivot").collect().head
    assert(row.getAs[String]("postings") === small.mkString(" "))
    assert(row.getAs[Long]("df") === 40L)
  }

  // ---- text_bm25 ----------------------------------------------------

  private def bm25Rows(dir: String): Seq[(Int, Int, Long, Double)] =
    SparkEntry.queries("text_bm25")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

  test("bm25: docs without any query term never appear; scores rank deterministically") {
    val dir = writeDocs(Seq(
      (1L, "s", "hash join merge"),
      (2L, "s", "hash alpha beta"),
      (3L, "s", "alpha beta gamma"))) // no query-1 terms
    val q1 = bm25Rows(dir).filter(_._1 == 1)
    assert(q1.map(_._3).toSet === Set(1L, 2L))
    // doc 1 matches all three query terms at identical length — must
    // outrank doc 2's single match
    assert(q1.sortBy(_._2).map(_._3) === Seq(1L, 2L))
    assert(q1.map(_._4).forall(_ > 0.0))
  }

  test("bm25: higher tf wins at equal doc length") {
    val dir = writeDocs(Seq(
      (1L, "s", "hash hash alpha beta"),
      (2L, "s", "hash alpha beta gamma")))
    val q1 = bm25Rows(dir).filter(_._1 == 1).sortBy(_._2)
    assert(q1.map(_._3) === Seq(1L, 2L))
  }

  test("bm25: shorter doc wins at equal tf (length normalization)") {
    val dir = writeDocs(Seq(
      (1L, "s", "hash alpha"),
      (2L, "s", "hash alpha beta gamma delta epsilon zeta eta")))
    val q1 = bm25Rows(dir).filter(_._1 == 1).sortBy(_._2)
    assert(q1.map(_._3) === Seq(1L, 2L))
  }

  // ---- text_collocations --------------------------------------------

  test("collocations: PMI matches the closed form and the support threshold holds") {
    // 6×"alpha beta" + 10×"c c" + 4×"p q" (below the c_xy >= 5 bar)
    val docs =
      (0L until 6L).map(i => (i, "s", "alpha beta")) ++
        (10L until 20L).map(i => (i, "s", "c c")) ++
        (30L until 34L).map(i => (i, "s", "p q"))
    val dir = writeDocs(docs)
    val rows = SparkEntry.queries("text_collocations")(spark, dir)
      .collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c_xy"), r.getAs[Double]("pmi")))).toMap
    assert(rows.keySet === Set(("alpha", "beta"), ("c", "c"))) // no (p,q)
    def pmi(cxy: Long, cx: Long, cy: Long): Double = {
      val nUni = 40.0; val nBig = 20.0
      BigDecimal(math.log(cxy) + 2.0 * math.log(nUni) - math.log(cx) -
        math.log(cy) - math.log(nBig))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows(("alpha", "beta")) === ((6L, pmi(6, 6, 6))))
    assert(rows(("c", "c"))       === ((10L, pmi(10, 20, 20))))
  }
}
