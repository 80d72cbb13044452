package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the `array_sum_agg` native aggregate (the
  * centroid accumulator): element-wise ARRAY<BIGINT> sums as one
  * mergeable buffer, replacing the posexplode → (key, dim) scalar-sum
  * shape that inflates rowcount by the embedding dimension.
  */
class ArraySumAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.plans.GraftExtensions.register(s)
    s
  }

  test("matches the posexplode scalar-sum result on multi-partition input") {
    import spark.implicits._
    val rows = (1 to 1000).map { i =>
      (s"g${i % 7}", Array((i % 11).toLong, (i % 13).toLong, (i % 17).toLong))
    }
    // 8 partitions forces partial buffers + cross-partition merges
    val df = rows.toDF("k", "arr").repartition(8)
    val viaAgg = df.groupBy("k")
      .agg(call_function("array_sum_agg", col("arr")).as("sums"))
      .select(col("k"), posexplode(col("sums")).as(Seq("pos", "s")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val viaExplode = df
      .select(col("k"), posexplode(col("arr")).as(Seq("pos", "v")))
      .groupBy("k", "pos").agg(sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaExplode)
    assert(viaAgg.nonEmpty)
  }

  test("null arrays contribute nothing; an all-null group yields NULL") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(Array(1L, 2L))),
      ("a", None),
      ("a", Some(Array(10L, 20L))),
      ("b", None)
    ).toDF("k", "arr").repartition(4)
    val out = df.groupBy("k")
      .agg(call_function("array_sum_agg", col("arr")).as("sums"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq) ==
      Some(Seq(11L, 22L)))
    assert(out("b").isEmpty)
  }

  test("null elements are skipped, like SQL sum") {
    val df = spark.sql(
      "SELECT array_sum_agg(a) AS sums FROM VALUES (array(1L, NULL, 3L)), (array(2L, 5L, NULL)) t(a)")
    assert(df.collect().head.getSeq[Long](0) == Seq(3L, 5L, 3L))
  }

  test("dimension drift between rows raises") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT array_sum_agg(a) FROM VALUES (array(1L, 2L)), (array(3L)) t(a)")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension mismatch")), e.getMessage)
  }

  test("non-ARRAY<BIGINT> input fails analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT array_sum_agg(a) FROM VALUES (array(1.5D)) t(a)").collect()
    }
    assert(e.getMessage.contains("array_sum_agg"), e.getMessage)
  }

  test("global aggregate over an empty relation yields NULL") {
    val row = spark.sql(
      "SELECT array_sum_agg(a) AS sums FROM (SELECT array(1L) AS a WHERE 1 = 0)")
      .collect().head
    assert(row.isNullAt(0))
  }
}
