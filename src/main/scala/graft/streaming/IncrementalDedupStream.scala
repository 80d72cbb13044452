package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

/** Streaming incremental dedup — the streaming twin of
  * `dedup_incremental`/`dedup_bloom_prefilter`: each arriving crawl
  * batch keeps only documents whose content hash has never been seen,
  * then appends the survivors' hashes to the seen-set store so later
  * batches dedup against them.
  *
  * State is a parquet hash store partitioned by `batch_id` — hashes
  * only, never text, so at 100 TB the store is ~1% of corpus bytes and
  * the per-epoch anti-join shuffles nothing wider than (id, hash).
  * Replay safety: an epoch reads only partitions with `batch_id` <
  * its own (partition-pruned), and both writes are dynamic partition
  * overwrites of the epoch's own partition — a replayed batch
  * recomputes identical survivors and overwrites itself, the
  * relay/AnnStream idempotence contract.
  *
  * Semantics match the batch operators (NullSafetySpec): within a
  * batch the smallest doc_id per hash is canonical; a NULL-text row
  * never equals any stored hash, so it is always novel (left-anti /
  * NOT EXISTS, never NOT IN), and NULL hashes stay out of the store.
  */
object IncrementalDedupStream {

  /** One epoch: dedup `batch` against the store below `batchId`, write
    * survivors to `outDir` and their hashes to `storeDir` (both
    * partitioned by batch_id, dynamic overwrite). Public so the spec
    * can drive a replay directly.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
      storeDir: String): Unit = {
    val spark = batch.sparkSession
    val perHash = Window.partitionBy("content_md5")
    val hashed0 = batch
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
      .withColumn("mn", min(col("doc_id")).over(perHash))
      // NULL hashes all share one window group, but every NULL-text doc
      // must survive within-batch canonicalization too — null never
      // equals null in dedup semantics
      .filter(col("content_md5").isNull || col("doc_id") === col("mn"))
      .drop("mn")
    // Probe through the Hadoop FileSystem API, not java.io.File — the
    // store lives wherever the checkpoint does (HDFS/S3 on a cluster,
    // file: locally), and a driver-local listFiles() would return null
    // forever there, silently degrading dedup to within-batch only.
    val hasStore = {
      val path = new org.apache.hadoop.fs.Path(storeDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(path) && Option(
        fs.globStatus(new org.apache.hadoop.fs.Path(path, "batch_id=*")))
        .exists(_.nonEmpty)
    }
    val survivors0 =
      if (!hasStore) hashed0
      else {
        val seen = spark.read.parquet(storeDir)
          .filter(col("batch_id") < batchId) // replay: own hashes excluded
          .select(col("h"))
        hashed0.join(seen, col("content_md5") === col("h"), "left_anti")
      }
    val survivors = survivors0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      survivors.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outDir)
      survivors.filter(col("content_md5").isNotNull)
        .select(col("content_md5").as("h"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(storeDir)
    } finally survivors.unpersist(blocking = true)
  }

  /** Start the stream: `docs` is a streaming frame with (doc_id LONG,
    * text STRING).
    */
  def start(spark: SparkSession, docs: DataFrame, outDir: String,
      storeDir: String, chkDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, outDir, storeDir)
      }
      .start()
}
