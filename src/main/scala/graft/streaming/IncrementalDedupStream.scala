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
  *
  * The store self-compacts every `compactEvery` epochs (StreamScaleProbe
  * measured 32 part files per epoch — unbounded partition growth is the
  * long-run listing cost at 100 TB): per-epoch partitions merge into a
  * generation partition `batch_id = -B` covering every hash first seen
  * before batch B. Crash safety needs no transaction because the store
  * is a SET under left-anti probing — a generation's inputs are deleted
  * only by a LATER batch (whose existence proves batch B committed), so
  * the worst crash leaves duplicate hashes across a generation and its
  * not-yet-deleted inputs, which cannot change any anti-join result.
  */
object IncrementalDedupStream {

  /** Compact once this many uncompacted per-epoch partitions accumulate;
    * steady-state store = 1 generation + < compactEvery epoch partitions.
    */
  val DefaultCompactEvery = 16

  /** One epoch: dedup `batch` against the store below `batchId`, write
    * survivors to `outDir` and their hashes to `storeDir` (both
    * partitioned by batch_id, dynamic overwrite). Public so the spec
    * can drive a replay directly.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
      storeDir: String, compactEvery: Int = DefaultCompactEvery): Unit = {
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
        // Bloom-prefilter the store probe (VERDICT r19 #1, the
        // dedup_bloom_prefilter shape): fold the BATCH's content
        // hashes into a bloom and prune the store scan with it before
        // the anti-join. No false negatives ⇒ every store hash that
        // could eliminate a batch row survives, so survivors are
        // identical; store-side rows entering the join drop from
        // O(corpus history) to O(batch matches + false positives),
        // which is what keeps the epoch cost flat as the store
        // accumulates (the join otherwise re-broadcasts/re-shuffles
        // the whole store every epoch). The bloom is a SCALAR SUBQUERY
        // (the dedup_bloom_prefilter form), not an eager collect — an
        // eager .head() added two driver round trips per epoch and
        // regressed the composed pipeline stream at bench scale; the
        // subquery builds inside the probing job itself. The item
        // estimate is a fixed 1M (a ~1.2 MB bloom): micro-batches are
        // trigger-bounded, and an over-large batch only raises the
        // false-positive rate (less pruning), never correctness.
        graft.plans.GraftExtensions.register(spark)
        batch.select(md5(col("text")).as("bh"))
          .createOrReplaceTempView("graft_incdedup_batch_md5")
        spark.read.parquet(storeDir)
          .filter(col("batch_id") < batchId) // replay: own hashes excluded
          .select(col("h"))
          .createOrReplaceTempView("graft_incdedup_store_md5")
        val seenPruned = spark.sql(
          """SELECT h FROM graft_incdedup_store_md5
            |WHERE graft_might_contain(
            |  (SELECT graft_bloom_agg(xxhash64(bh), 1000000L)
            |   FROM graft_incdedup_batch_md5),
            |  xxhash64(h))""".stripMargin)
        hashed0.join(seenPruned, col("content_md5") === col("h"), "left_anti")
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
    compactStore(spark, storeDir, batchId, compactEvery)
  }

  /** Replay-safe store compaction, run at the tail of batch `batchId`.
    *
    * Partition algebra: base partitions `batch_id = b >= 0` hold batch
    * b's first-seen hashes; a generation `batch_id = -B` holds the
    * distinct union of everything first seen before batch B. Three
    * invariants keep replays exact with zero coordination:
    *
    *  1. A generation written at batch B reads only `batch_id < B`
    *     minus itself — never B's own partition — so a replayed batch B
    *     still probes a store without its own hashes.
    *  2. Inputs are deleted only when a generation covering them was
    *     created by an EARLIER batch: the stream processes batch C only
    *     after committing C-1, so `-g` with g < C is durable. Until
    *     then the store holds duplicates, which left-anti ignores.
    *  3. Re-running batch B's compaction dynamic-overwrites `-B` from
    *     the same inputs (deletable only at a later batch) — idempotent.
    */
  private[graft] def compactStore(spark: SparkSession, storeDir: String,
      batchId: Long, compactEvery: Int, hashCol: String = "h"): Unit = {
    if (compactEvery <= 0) return
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partIds(): Seq[Long] = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(path, "batch_id=*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("batch_id=").toLong).toOption)
    val parts = partIds()
    // 1. drop partitions covered by a generation a committed batch wrote
    val cov = parts.filter(g => g < 0 && -g < batchId).map(-_)
      .foldLeft(0L)(math.max)
    parts.filter(p => (p >= 0 && p < cov) || (p < 0 && -p < cov))
      .foreach { p =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"batch_id=$p"), true)
      }
    // 2. fold surviving history into a new generation when due
    val pending = parts.count(p => p >= cov && p < batchId)
    if (pending >= compactEvery && batchId > 0) {
      spark.read.parquet(storeDir)
        .filter(col("batch_id") < batchId && col("batch_id") =!= -batchId)
        .select(col(hashCol)).distinct()
        .withColumn("batch_id", lit(-batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(storeDir)
    }
  }

  /** Start the stream: `docs` is a streaming frame with (doc_id LONG,
    * text STRING).
    */
  def start(spark: SparkSession, docs: DataFrame, outDir: String,
      storeDir: String, chkDir: String,
      compactEvery: Int = DefaultCompactEvery): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, outDir, storeDir, compactEvery)
      }
      .start()
}
