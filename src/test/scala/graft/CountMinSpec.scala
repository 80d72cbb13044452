package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMin

/** Count-min sketch invariants: the host-side hash matches the SQL
  * 60-bit hash the other operators use, estimates never undercount,
  * and merge is order-independent (the property that makes the
  * aggregation exact-at-any-parallelism).
  */
class CountMinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val words =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")

  test("hash60 equals the SQL conv(substr(md5,1,15),16,10) hash") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      words.toSeq.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(col("t"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(CountMin.hash60(w) == got(w), s"hash mismatch for '$w'")
    }
  }

  test("estimates never undercount and respect the epsilon-N band") {
    // deterministic skewed multiset: word i appears (i+1)^2 times
    val terms = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill((i + 1) * (i + 1))(w)
    }
    val sk = terms.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce)
    val n = terms.length
    words.zipWithIndex.foreach { case (w, i) =>
      val truth = (i + 1) * (i + 1)
      val est = CountMin.estimate(sk, w)
      assert(est >= truth, s"$w: est $est < true $truth")
      // e/width * n, rounded up, is the standard CM error band
      assert(est <= truth + (math.E / CountMin.Width * n).ceil.toLong,
        s"$w: est $est too far above $truth (n=$n)")
    }
  }

  test("merge is commutative, associative, and matches single-pass") {
    val terms = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(i + 3)(w)
    }
    val single = terms.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce)
    // split into 3 partitions, merge in two different orders
    val parts = terms.grouped(terms.length / 3 + 1).toSeq
      .map(_.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce))
    def m(a: Array[Long], b: Array[Long]) =
      CountMin.Agg.merge(a.clone(), b.clone())
    val fwd = parts.reduce(m)
    val rev = parts.reverse.reduce(m)
    assert(fwd.sameElements(single))
    assert(rev.sameElements(single))
  }

  test("estimateCol is bit-identical to the host-side estimate, with no UDF") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark) // estimateCol needs md5_top60
    val terms = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(i + 2)(w)
    }
    val sk = terms.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce)
    val df = words.toSeq.toDF("term")
      .withColumn("sk", typedLit(sk.toSeq))
      .withColumn("est", CountMin.estimateCol(col("sk"), col("term")))
    val got = df.select("term", "est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == CountMin.estimate(sk, w), s"estimateCol mismatch for '$w'")
    }
    // the point of the declarative form: nothing in the plan falls back
    // to a Scala UDF (round-9 verdict item 7)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    val hhPlan = SparkEntry.queries("text_heavy_hitters")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!hhPlan.contains("UDF"), "text_heavy_hitters must stay UDF-free")
  }

  test("the distributed aggregation equals the host-side sketch") {
    import spark.implicits._
    val terms = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(i + 2)(w)
    }
    val local = terms.foldLeft(CountMin.Agg.zero)(CountMin.Agg.reduce)
    val dist = spark.createDataset(terms.toSeq).repartition(8)
      .select(CountMin.Agg.toColumn).head()
    assert(dist.sameElements(local),
      "8-partition aggregation must be bit-identical to single-pass")
  }
}
