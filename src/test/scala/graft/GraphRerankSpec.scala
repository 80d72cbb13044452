package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of rel_pagerank (fixed-point integer PageRank over the
  * customer↔supplier graph) and vec_pq_rerank (ADC shortlist → exact
  * rerank). The PageRank values on the star fixture are hand-computed
  * through all three rounds with the exact floor arithmetic, so any
  * drift in the fixed-point formula fails loudly.
  */
class GraphRerankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  test("pagerank: star graph matches the hand-computed fixed-point ranks") {
    // two customers each trading with one supplier:
    //   und edges c1↔s1, c2↔s1; N=3, deg(c*)=1, deg(s1)=2
    val dir = tmp("pr")
    import spark.implicits._
    Seq((10L, 1L), (20L, 1L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, 1L), (20L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("rel_pagerank")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[String]("node_type"),
        r.getAs[Long]("entity_key"), r.getAs[Long]("rank_units"))).toSeq
    // hand-rolled: r0 = 333333333333 each; teleport = 49999999999;
    // three rounds of contrib = r div deg, r' = T + (85·inflow) div 100
    assert(rows === Seq(
      (3L, "supplier", 1L, 580541666661L),
      (2L, "customer", 1L, 209729166663L),
      (4L, "customer", 2L, 209729166663L)))
  }

  test("pagerank: sf0.001 ranks conserve mass within floor loss and rank sinks") {
    val rows = SparkEntry.queries("rel_pagerank")(spark, sf).collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getAs[Long]("rank_units"))
    // output ordered by rank desc with node tiebreak
    assert(ranks.sameElements(ranks.sortBy(-_)))
    // every rank at least the teleport floor, none above total mass
    assert(ranks.forall(r => r > 0 && r < PrTotal))
    // suppliers aggregate many customers → the top of the ranking is
    // supplier-heavy on the TPC-H-ish trading graph
    assert(rows.take(5).count(_.getAs[String]("node_type") == "supplier") >= 3)
  }

  private val PrTotal = 1000000000000L

  test("pq rerank: exact top-10 of the shortlist with consistent rank columns") {
    val rows = SparkEntry.queries("vec_pq_rerank")(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("rank_exact")).toSeq === (1L to 10L))
    val exact = rows.map(_.getAs[Double]("exact_dot"))
    assert(exact.sameElements(exact.sortBy(-_)))
    rows.foreach { r =>
      val ra = r.getAs[Long]("rank_adc")
      assert(ra >= 1 && ra <= 50)
      assert(r.getAs[Boolean]("promoted") === (ra > 10))
    }
  }

  test("pq rerank: agrees with brute-force exact ranking restricted to the shortlist") {
    // the rerank winner set must be the exact-dot top-10 AMONG the ADC
    // top-50 — recompute the shortlist membership independently from
    // vec_pq_ann's scoring (top-10 ADC ⊆ top-50 ADC, so every pq_ann
    // row must appear in the rerank shortlist ranking)
    val rerank = SparkEntry.queries("vec_pq_rerank")(spark, sf)
      .select("vec_id", "rank_adc").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("rank_adc")).toMap
    val adcTop = SparkEntry.queries("vec_pq_ann")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    // ADC top-10 ids that survived exact rerank keep their ADC rank ≤ 10
    adcTop.zipWithIndex.foreach { case (id, i) =>
      rerank.get(id).foreach(ra => assert(ra === i + 1))
    }
  }
}
