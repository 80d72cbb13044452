package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Online ANN serving: streamed query vectors must get exactly the
  * batch brute-force answers (same determinism contract), across
  * multiple micro-batches.
  */
class AnnStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val querySchema = StructType(Seq(
    StructField("q_id", LongType),
    StructField("q_embedding", ArrayType(DoubleType))))

  test("indexed serving: recall@10 vs the exact answer is pinned") {
    // The cell-confined path (default nprobe=8 against the trained
    // k=16-cell quantizer on this fixture) scores ~half the corpus per
    // query; this pins its recall@10 against an INDEPENDENT in-memory
    // exact top-10 (same left-associated dots, same HALF_UP rounding,
    // same (sim DESC, vec_id) tiebreak), so a quantizer regression
    // can't silently walk the serving quality off a cliff.
    val root = Files.createTempDirectory("ann-idx").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val qids = Seq(0L, 9L, 17L, 25L, 33L, 41L, 49L, 57L)
    graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("q_embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/_stage")
    val part = new java.io.File(s"$in/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$in/q.parquet").toPath)

    val queries = spark.readStream.schema(querySchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.AnnStream.start(
      spark, queries, sf, s"$root/out", s"$root/chk", k = 10)
    try q.processAllAvailable() finally q.stop()

    // independent exact leg
    val corpus = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val nrm = corpus.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val byId = corpus.toMap
    val exact = qids.map { qid =>
      val qe = byId(qid); val qn = nrm(qid)
      qid -> corpus.map { case (id, e) =>
        (r6(dot(e, qe) / (nrm(id) * qn)), id)
      }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
    }.toMap

    val got = spark.read.parquet(s"$root/out")
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map(qid => (exact(qid) & got(qid)).size / 10.0)
    // Measured on this fixture: per-query 0.6-1.0, mean 0.81 at
    // nprobe=8 over k=16 trained cells. The fixture corpus is
    // near-UNIFORM random vectors — the WORST case for cell
    // confinement (similarities are flat, the true top-10 scatters
    // across cells; ~half the corpus is probed and recall tracks the
    // probed fraction plus self-cell bias). Real serving corpora have
    // the cluster structure the quantizer exploits — the θ≥0.9
    // operating point measures 96% (SCALING.md §semantic recall). The
    // floors pin this worst case so a quantizer regression still
    // trips them.
    assert(recalls.forall(_ >= 0.5),
      s"per-query recall@10: ${qids.zip(recalls).mkString(", ")}")
    assert(recalls.sum / recalls.size >= 0.7,
      s"mean recall@10 ${recalls.sum / recalls.size}")
    // the query itself always survives confinement (its own cell)
    got.foreach { case (qid, ids) => assert(ids.contains(qid), s"q$qid") }
  }

  test("indexed per-batch plan: broadcast joins only, corpus never shuffles") {
    // the serving plan at 100 TB: the corpus side of both joins must be
    // probed by a BROADCAST of the tiny side (centroids / probes) — a
    // SortMergeJoin or CartesianProduct here would shuffle the corpus
    // every micro-batch
    val (cents, a) =
      graft.operators.VectorQueries.semanticModel(spark, sf)
    val corpus = a
      .join(graft.Tables.embeddings(spark, sf).select("vec_id", "label"),
        Seq("vec_id"))
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(col("vec_id"), col("label"), col("e"), col("nrm"), col("list_id"))
    val batch = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("q_embedding"))
    val plan = graft.streaming.AnnStream
      .answer(corpus, cents, batch, 10, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the probe selection must be the compiled map-side expression,
    // not a centroid broadcast + ranking window (the r17 per-epoch
    // fixed cost): exactly ONE row_number window remains — the final
    // top-k over candidates
    assert(plan.contains("semantic_probe_cells"), plan)
    assert("windowspecdefinition".r.findAllIn(plan).size == 1, plan)
  }

  test("streamed queries get the batch top-k answers per micro-batch") {
    val root = Files.createTempDirectory("ann-stream").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // two corpus vectors replayed as queries, one file each → two
    // micro-batches; each probe's top-1 must be itself (cosine 1.0),
    // proving scoring + ranking end to end
    Seq(3L, 7L).foreach { id =>
      graft.Tables.embeddings(spark, sf)
        .filter(col("vec_id") === id)
        .select(col("vec_id").as("q_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("q_embedding"))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/_stage")
      val part = new java.io.File(s"$in/_stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$in/q$id.parquet").toPath)
    }

    val queries = spark.readStream.schema(querySchema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.AnnStream.start(
      spark, queries, sf, s"$root/out", s"$root/chk", k = 3)
    try {
      q.processAllAvailable()
      // the corpus is served from the session cache, not re-scanned
      // per micro-batch: after two batches the cached relation is
      // still resident (it is released only on termination)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "serving corpus must stay cached while the stream runs")
    } finally q.stop()

    val got = spark.read.parquet(s"$root/out")
    assert(got.count() == 6) // 2 queries × top-3
    // each probe's nearest neighbour is itself at sim 1.0, rank 1
    got.filter(col("rn") === 1).collect().foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"), r.toString)
      assert(r.getAs[Double]("sim") == 1.0, r.toString)
    }
    // one batch_id partition per micro-batch: the idempotence key a
    // replayed batch overwrites instead of appending duplicates
    assert(got.select("batch_id").distinct().count() == 2)
    // termination releases the serving cache (listener fires async)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(100)
    assert(spark.sharedState.cacheManager.isEmpty,
      "stream termination must release the serving corpus cache")
  }
}
