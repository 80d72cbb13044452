package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

/** Online benchmark decontamination — the streaming twin of
  * `dedup_decontaminate`: incoming crawl batches are checked against
  * the held-out eval set's passage hashes AS THEY ARRIVE, so
  * contaminated documents are flagged before they ever land in the
  * training corpus (the batch pass then only re-certifies).
  *
  * Per-doc passage hashing is the SAME definition as the batch
  * operator ([[graft.operators.TextQueries.passageHashes]]), so the
  * two paths agree by construction. The eval hash set is built once at
  * stream start (small — a benchmark corpus, not the crawl) and served
  * from the session cache; each micro-batch joins against it on the
  * hash only — payloads never shuffle. Output is `batch_id`-
  * partitioned with dynamic overwrite, so a replayed batch overwrites
  * its previous attempt (the relay/AnnStream idempotence contract).
  */
object DecontaminateStream {

  /** Start the stream: `docs` is a streaming frame with (doc_id LONG,
    * text STRING); the eval set is `sfDir`'s documents with
    * `doc_id % 13 == 0` (the batch operator's rule).
    */
  def start(spark: SparkSession, docs: DataFrame, sfDir: String,
      outDir: String, chkDir: String): StreamingQuery = {
    // passage hashing uses the native md5_top60 expression
    graft.plans.GraftExtensions.register(spark)
    val evalSet = graft.operators.TextQueries
      .passageHashes(
        graft.Tables.documents(spark, sfDir).filter(col("doc_id") % 13 === 0),
        stride = 1)
      .select(col("ph").as("eph")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    evalSet.queryExecution.toRdd.count()
    val query = try docs.writeStream
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val perDoc = graft.operators.TextQueries
          .passageHashes(batch, stride = 1)
          .join(evalSet, col("ph") === col("eph"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_passages"), count(col("eph")).as("n_hits"))
        // EVERY doc in the batch gets a verdict row: a sub-8-token doc
        // has no passages to test, so it reports (0, 0, clean) rather
        // than silently vanishing from a report consumers gate on
        batch.select(col("doc_id")).distinct()
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_passages"), lit(0L)).as("n_passages"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .start()
    catch {
      case e: Throwable => evalSet.unpersist(blocking = true); throw e
    }
    // non-blocking: listener-bus thread (see AnnStream) — blocking
    // release is for the per-query batch path, not stream teardown
    StreamLifecycle.onTerminated(spark, query)(
      () => evalSet.unpersist(blocking = false))
    query
  }
}
