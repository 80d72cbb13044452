package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Plan-staging utilities for queries whose DAG fans out over one
  * expensive subtree (shared by the dedup and ANN pipelines).
  *
  * Spark recomputes a logical subtree once per consumer unless it is
  * persisted — `ReusedExchange` only kicks in when the consumers shuffle
  * on the SAME keys, which the dedup pipelines deliberately don't (they
  * group/join the shared relation by different keys). At 100 TB,
  * re-exploding and re-hashing the corpus 3-4× is the dominant cost, so
  * the fan-out queries stage the shared subtree explicitly.
  */
object Stage {

  /** Evaluate `build` over a persisted copy of `shared`, materialize the
    * (small) result, and release the staged intermediate.
    *
    * The returned DataFrame is persisted and already materialized, so
    * the caller's action replays cached rows instead of re-deriving the
    * plan — and, critically, instead of re-computing `shared`, which is
    * unpersisted before returning. MEMORY_AND_DISK keeps the staged
    * relation spill-safe when a 100 TB corpus shard exceeds executor
    * memory.
    *
    * Callers that re-materialize the result themselves (e.g. into a
    * reliable checkpoint) should `unpersist()` the returned frame when
    * done so no cache entry outlives its use.
    */
  def fanout(shared: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val staged = shared.persist(StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the fan-out plan runs: the consumer stages are
    // independent and get submitted concurrently, so a lazily-built
    // cache would be raced — each stage recomputing the same partitions
    // ("Block already exists" churn) and saving nothing
    staged.queryExecution.toRdd.count()
    val out = build(staged).persist(StorageLevel.MEMORY_AND_DISK)
    // finalize THIS frame's AQE plan and populate its cache; every
    // consumer now replays the staged rows
    out.queryExecution.toRdd.count()
    staged.unpersist(blocking = false)
    out
  }

  /** Reliable-checkpoint directory for iterative queries. On a real
    * cluster this must be durable shared storage (HDFS/S3): set it up
    * front via `sparkContext.setCheckpointDir`; this helper only fills
    * in a local default when nothing is configured (local/test mode),
    * so an executor loss never silently pins lineage to executor-local
    * storage the way `localCheckpoint()` would.
    */
  def ensureCheckpointDir(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft-ckpt-${sc.applicationId}").getAbsolutePath)
  }
}
