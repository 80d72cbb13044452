package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CheckpointLease

/** Single-writer lease semantics (A18 port): atomic acquire, holder
  * diagnostics on conflict, refresh revision bump, release/re-acquire,
  * and the ownership report over a REAL streaming checkpoint.
  */
class CheckpointLeaseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("acquire is exclusive and the conflict names the holder") {
    val dir = Files.createTempDirectory("lease").toString
    val lease = CheckpointLease.acquire(spark, dir, version = "r5")
    assert(lease.record.revision == 1L)
    assert(lease.record.owner.contains("/")) // host/pid/nanos
    val err = intercept[IllegalStateException] {
      CheckpointLease.acquire(spark, dir, version = "intruder")
    }
    assert(err.getMessage.contains("already held"), err.getMessage)
    assert(err.getMessage.contains("version=r5"), err.getMessage)
    assert(err.getMessage.contains(s"pid=${lease.record.pid}"), err.getMessage)
    lease.release()
  }

  test("refresh bumps revision; release permits re-acquire") {
    val dir = Files.createTempDirectory("lease").toString
    val lease = CheckpointLease.acquire(spark, dir, version = "v1")
    val r2 = lease.refresh()
    assert(r2.revision == 2L)
    val r3 = lease.refresh()
    assert(r3.revision == 3L)
    assert(r3.owner == lease.record.owner) // owner survives refresh
    lease.release()
    lease.release() // idempotent, like the reference's Delete tolerance
    val again = CheckpointLease.acquire(spark, dir, version = "v2")
    assert(again.record.version == "v2")
    again.release()
  }

  test("a stale lease is broken on acquire; refresh detects the loss") {
    val dir = Files.createTempDirectory("lease").toString
    val dead = CheckpointLease.acquire(spark, dir, version = "dead")
    // dead holder never refreshes; with a zero staleness horizon the
    // next acquire must take over (the reference's TTL expiry)
    Thread.sleep(5)
    val taker = CheckpointLease.acquire(spark, dir, version = "taker",
      staleAfterMs = 1L)
    assert(taker.record.version == "taker")
    // the usurped holder's refresh must FAIL (abort-the-run semantics),
    // not clobber the new owner
    val err = intercept[IllegalStateException] { dead.refresh() }
    assert(err.getMessage.contains("lost"), err.getMessage)
    // ...and its RELEASE must be an ownership-checked no-op: the dying
    // usurped holder's shutdown path cannot destroy the live lease
    dead.release()
    assert(taker.refresh().revision == 2L)
    taker.release()
  }

  test("a live lease is NOT broken within the staleness horizon") {
    val dir = Files.createTempDirectory("lease").toString
    val live = CheckpointLease.acquire(spark, dir, version = "live")
    val err = intercept[IllegalStateException] {
      CheckpointLease.acquire(spark, dir, version = "intruder",
        staleAfterMs = 60000L)
    }
    assert(err.getMessage.contains("already held"), err.getMessage)
    live.release()
  }

  test("describe reports lease holder and Spark's own checkpoint state") {
    val root = Files.createTempDirectory("lease-desc").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    spark.range(5).select(col("id"))
      .write.mode("overwrite").parquet(in)
    val chk = s"$root/chk"
    // a real micro-batch query stamps metadata/offsets/commits
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .parquet(in)
      .writeStream.format("noop")
      .option("checkpointLocation", chk)
      .start()
    try q.processAllAvailable() finally q.stop()
    val lease = CheckpointLease.acquire(spark, chk, version = "r5")
    val own = CheckpointLease.describe(spark, chk)
    assert(own.leaseHolder.exists(_.contains("version=r5")), own)
    assert(own.queryId.contains(q.id.toString), own)
    assert(own.latestOffsetBatch.contains(0L), own)
    assert(own.latestCommitBatch.contains(0L), own)
    lease.release()
    assert(CheckpointLease.describe(spark, chk).leaseHolder.isEmpty)
    // an empty dir reports nothing rather than failing
    val blank = CheckpointLease.describe(spark, s"$root/nothing")
    assert(blank == CheckpointLease.Ownership(None, None, None, None))
  }
}
