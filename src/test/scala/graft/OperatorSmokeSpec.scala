package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator runs on sf0.001 under the test session and
  * yields a sane result (value correctness is the DuckDB oracle's job —
  * this catches runtime regressions fast).
  */
class OperatorSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // Queries whose correct result may legitimately be empty at sf0.001.
  private val mayBeEmpty =
    Set("rel_anti_join", "dedup_neardup_pairs", "vec_cosine_neardup",
      "dedup_ngram_jaccard", "dedup_clusters")

  // Queries that are intentionally rows-only (no deterministic oracle).
  // empty since round 5: every registered query is oracle-paired (the
  // approx sketches are certified via within-tolerance booleans against
  // exact values, so even they hash-compare)
  private val rowsOnly = Set.empty[String]

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is knowingly rows-only") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    // keep this list tiny and intentional
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
