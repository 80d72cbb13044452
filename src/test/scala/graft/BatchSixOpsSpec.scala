package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the sixth round-10 batch (vec_centroid_drift,
  * media_scene_cut, train_weighted_sample): an exact hand-computed
  * drift fixture, scene/shot arithmetic consistency, and the weighted
  * sampler's determinism + size-bias property.
  */
class BatchSixOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(Stage.deleteRecursively(new java.io.File(dir)))
    dir
  }

  test("centroid drift: orthogonal halves give exactly sqrt(2) drift") {
    val dir = tmp("drift")
    import spark.implicits._
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    // even vec_ids (half A) sit on axis 0, odd (half B) on axis 1
    (0 until 10).map(i => (i.toLong, if (i % 2 == 0) e1 else e2, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("vec_centroid_drift")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("na") === 5L)
    assert(r.head.getAs[Long]("nb") === 5L)
    assert(r.head.getAs[Double]("drift_l2") === 1.414214)
    assert(r.head.getAs[Double]("max_dim_drift") === 1.0)
  }

  test("centroid drift: identical halves give exactly zero drift") {
    val dir = tmp("drift0")
    import spark.implicits._
    val e = Array.tabulate(64)(i => (i * 0.25f) - 4.0f)
    (0 until 8).map(i => (i.toLong, e, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("vec_centroid_drift")(spark, dir).collect()
    assert(r.head.getAs[Double]("drift_l2") === 0.0)
    assert(r.head.getAs[Double]("max_dim_drift") === 0.0)
  }

  test("scene cut: shot arithmetic consistent across the corpus") {
    val res = SparkEntry.queries("media_scene_cut")(spark, sf)
    val jpeg = operators.MultimodalQueries.mediaTable(spark, sf)
      .filter(col("format") === "jpeg")
      .select(col("media_id"), col("n_frames").as("nf"))
    val rows = res.join(jpeg, "media_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_frames") === r.getAs[Int]("nf").toLong)
      assert(r.getAs[Long]("n_shots") === r.getAs[Long]("n_cuts") + 1)
      assert(r.getAs[Long]("mean_shot_milliframes") ===
        r.getAs[Long]("n_frames") * 1000 / r.getAs[Long]("n_shots"))
      val firstIdx = r.fieldIndex("first_cut_w")
      if (r.getAs[Long]("n_cuts") == 0) assert(r.isNullAt(firstIdx))
      else assert(r.getInt(firstIdx) >= 1)
    }
    // the 2^31 jump threshold fires on ~half of frame transitions —
    // the cut column must be neither degenerate-empty nor all-cut
    val totalCuts = rows.map(_.getAs[Long]("n_cuts")).sum
    val totalTransitions = rows.map(_.getAs[Long]("n_frames") - 1).sum
    assert(totalCuts > 0 && totalCuts < totalTransitions)
  }

  test("weighted sample: deterministic, ranked, and size-biased") {
    val q = SparkEntry.queries("train_weighted_sample")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.map(_.getAs[Long]("rank")).toSeq === (1L to 100L))
    val keys = a.map(_.getAs[Double]("sample_key"))
    assert(keys.sameElements(keys.sortBy(-_)))
    assert(keys.forall(_ <= 0.0)) // ln(u) ≤ 0 ⇒ keys ≤ 0, best near 0
    // A-ES inclusion probability rises with weight: the sample's mean
    // weight must exceed the corpus mean
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = a.map(_.getAs[Long]("weight")).sum.toDouble / a.length
    assert(sampleMean > corpusMean)
  }
}
