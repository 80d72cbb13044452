package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

/** Online similarity retrieval — the serving form of the batch ANN
  * operators: a stream of query vectors is answered per micro-batch
  * against a STATIC corpus with exact cosine top-k (brute force below
  * ~10^9 corpus vectors; swap the corpus frame for its LSH-bucketed
  * projection for the indexed path — the batch operators and this
  * stream share the same dot-product/codegen plumbing via
  * `array_dot`).
  *
  * Shape: `foreachBatch` re-uses the batch top-k logic verbatim — the
  * corpus (with its precomputed norms) is persisted ONCE at stream
  * start and served from executor memory every micro-batch; the
  * per-batch broadcast is the QUERY side (tiny). The cache is released
  * when the query terminates (listener below), so a served-then-stopped
  * stream leaves no session state behind.
  *
  * Delivery: foreachBatch is at-least-once — a crash between the sink
  * write and the epoch commit replays the batch. Each batch therefore
  * writes its own `batch_id=` partition with dynamic partition
  * overwrite: the replay overwrites its previous attempt instead of
  * appending duplicates, making the sink effectively-once (same
  * contract the relay documents for its ack barrier).
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE batch 1, so the first query doesn't pay the
    // parquet scan + norm computation under serving latency
    corpus.queryExecution.toRdd.count()
    val query = try queries.writeStream
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
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
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .start()
    catch {
      // a failed start must not leak the materialized corpus into the
      // session cache (the cross-query tax Stage.fanout guards against)
      case e: Throwable => corpus.unpersist(blocking = true); throw e
    }
    // release the serving cache when THIS query terminates — the stream
    // handle outlives start(), so cleanup must be event-driven (and
    // race-hardened: StreamLifecycle also covers a query that died
    // before the listener registered). Non-blocking here, unlike
    // Stage.fanout: this runs on the listener bus thread, where a
    // blocking drop would stall event dispatch, and no query is
    // waiting behind a terminated stream.
    StreamLifecycle.onTerminated(spark, query)(
      () => corpus.unpersist(blocking = false))
    query
  }
}
