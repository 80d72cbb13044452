package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.U128Sum
import graft.model.CdcModel

/** The u128 Aggregator must be exact PAST Decimal(38)'s reach — the
  * point of its existence (§7.4): u128 max is 39 digits, and sums of
  * many u128s grow beyond any fixed precision.
  */
class U128SumSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("sums u128-max values exactly, past any decimal precision") {
    import spark.implicits._
    val n = 1000
    val df = Seq.fill(n)(CdcModel.MaxU128String).toDF("v")
      .repartition(7) // exercise partial-buffer merge across partitions
    val got = df.agg(udaf(U128Sum).apply(col("v"))).collect().head.getString(0)
    val want = (BigInt(CdcModel.MaxU128String) * n).toString
    assert(want.length >= 42) // beyond Decimal(38)
    assert(got == want)
  }

  test("buffer algebra: zero, reduce, merge, finish") {
    val b = U128Sum.reduce(U128Sum.zero, "170141183460469231731687303715884105728") // 2^127
    val b2 = U128Sum.reduce(U128Sum.zero, CdcModel.MaxU128String)
    val merged = U128Sum.merge(b, b2)
    assert(U128Sum.finish(merged) ==
      (BigInt("170141183460469231731687303715884105728") +
        BigInt(CdcModel.MaxU128String)).toString)
    assert(U128Sum.finish(U128Sum.zero) == "0")
  }
}
