package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus regression: a corpus with NO near-dup pairs must
  * yield an empty cluster set, not a driver NPE. (The sum-based
  * convergence witness is SQL NULL over an empty label frame — the
  * round-3 regression this pins down.)
  */
class EmptyGraphSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("neardupClusters converges to empty on a pairless corpus") {
    val dir = Files.createTempDirectory("graft-empty").toString
    // one document: the band self-join (doc_a < doc_b) can never emit a
    // candidate, so the edge graph is empty by construction
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextQueries.neardupClusters(spark, dir)
    assert(out.count() == 0L)
  }
}
