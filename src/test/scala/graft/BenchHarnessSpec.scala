package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench artifact must fail LOUDLY: a query that throws still has a
  * wall time (the attempt cost something) but must be keyed in the
  * artifact's error map so a consumer never mistakes it for a plausible
  * fast run (round-9 verdict item 1).
  */
class BenchHarnessSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val good: (SparkSession, String) => DataFrame =
    (s, dir) => s.read.parquet(s"$dir/region.parquet")
  private val bad: (SparkSession, String) => DataFrame =
    (s, _) => { throw new RuntimeException("injected bench failure"); s.range(1).toDF() }
  // fails at EXECUTION time, not construction — the noop write throws
  private val badLazy: (SparkSession, String) => DataFrame =
    (s, _) => {
      import s.implicits._
      s.range(4).toDF("n").selectExpr("assert_true(n < 2) as ok")
    }

  test("a throwing query is marked with err; healthy queries are not") {
    val timed = Bench.timeQueries(spark, sf,
      Seq("ok" -> good, "boom" -> bad, "boom_lazy" -> badLazy), reps = 2).toMap
    assert(timed("ok").err.isEmpty)
    assert(timed("ok").min > 0.0)
    assert(timed("boom").err.exists(_.contains("injected bench failure")))
    val lazyErr = timed("boom_lazy").err
    assert(lazyErr.isDefined, s"execution-time failure must be marked: $lazyErr")
    // the wall time of a failed attempt is still recorded (real cost),
    // but the err marker is what invalidates it
    assert(timed("boom").median >= 0.0)
  }

  test("error messages are truncated and non-null-safe") {
    val nullMsg: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException(null: String)
    val longMsg: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("x" * 1000)
    val timed = Bench.timeQueries(spark, sf,
      Seq("nul" -> nullMsg, "lng" -> longMsg), reps = 1).toMap
    assert(timed("nul").err.exists(_.nonEmpty)) // class name fallback
    assert(timed("lng").err.exists(_.length <= 200))
  }
}
