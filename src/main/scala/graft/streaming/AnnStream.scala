package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Online similarity retrieval — the serving form of the batch ANN
  * operators: a stream of query vectors is answered per micro-batch
  * against a STATIC corpus with exact cosine top-k (brute force below
  * ~10^9 corpus vectors; swap the corpus frame for its LSH-bucketed
  * projection for the indexed path — the batch operators and this
  * stream share the same dot-product/codegen plumbing via
  * `array_dot`).
  *
  * Shape: `foreachBatch` re-uses the batch top-k logic verbatim — the
  * corpus is analyzed once, broadcast per batch is the QUERY side
  * (tiny), and the corpus scan is the per-batch cost, exactly the
  * batch `vec_knn_multi` plan. Results append to a parquet sink keyed
  * by (batch query id, rank).
  */
object AnnStream {

  /** Start the retrieval stream: `queries` is a streaming frame with
    * (q_id LONG, q_embedding ARRAY<DOUBLE>); the corpus is read from
    * `sfDir` once. Top-`k` per query by rounded cosine with vec_id
    * tiebreak — the same determinism contract as the batch operators.
    */
  def start(spark: SparkSession, queries: DataFrame, sfDir: String,
            outDir: String, chkDir: String, k: Int = 5): StreamingQuery = {
    graft.plans.GraftExtensions.register(spark)
    val corpus = graft.Tables.embeddings(spark, sfDir)
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(call_function("array_dot", col("e"), col("e"))))
      .select(col("vec_id"), col("label"), col("e"), col("nrm"))
    queries.writeStream
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val q = batch.select(col("q_id"),
          col("q_embedding").as("qe"),
          sqrt(call_function("array_dot", col("q_embedding"),
            col("q_embedding"))).as("q_nrm"))
        val scored = corpus.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id"), col("label"),
            round(call_function("array_dot", col("e"), col("qe")) /
              (col("nrm") * col("q_nrm")), 6).as("sim"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
