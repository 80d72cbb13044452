package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer lease + ownership inspection for a streaming
  * checkpoint directory — the Spark-native port of the reference's
  * KV-store writer lock (reference: runner.go:607-724).
  *
  * Spark's own single-writer model is the checkpoint dir itself (one
  * running query per dir; a second writer fails at offset-commit
  * time), which is why the relay doesn't REQUIRE a lease — see the
  * design decision in SURVEY §1.1. What that model lacks is the
  * reference's two operational niceties:
  *
  *   - fail FAST at startup (not at first commit) when another driver
  *     already owns the dir, naming the holder
  *     (runner.go:645-664 `lockHolderDescription`);
  *   - a "who owns this checkpoint" report an operator can run against
  *     any dir.
  *
  * Both come from one advisory lease file inside the checkpoint dir,
  * created atomically via the Hadoop FileSystem API (`create` with
  * overwrite=false — atomic on HDFS and local FS; on S3 use a
  * consistent store or accept first-commit detection as the backstop).
  * The lease is ADVISORY: it guards cooperating graft drivers and
  * never blocks Spark itself.
  */
object CheckpointLease {

  val LeaseFile = "_graft_lease.json"

  /** Mirror of the reference's lockRecord payload
    * (runner.go:703-718): owner = host/pid/nanos, plus a monotonically
    * increasing revision standing in for the KV store's.
    */
  final case class LeaseRecord(owner: String, hostname: String, pid: Long,
      version: String, updatedAt: String, revision: Long) {
    def json: String = {
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
      }
      s"""{"owner":"${esc(owner)}","hostname":"${esc(hostname)}",""" +
        s""""pid":$pid,"version":"${esc(version)}",""" +
        s""""updatedAt":"${esc(updatedAt)}","revision":$revision}"""
    }
  }

  /** reference runner.go:645-664 — the holder string surfaced when an
    * acquire hits an existing lock, and by [[describe]].
    */
  def holderDescription(raw: String): String =
    parseRecord(raw) match {
      case Some(r) =>
        s"owner=${r.owner} host=${r.hostname} pid=${r.pid} " +
          s"version=${r.version} updated_at=${r.updatedAt} revision=${r.revision}"
      case None => "(unparseable lease payload)"
    }

  // no JSON library on the sealed classpath beyond Spark's internals:
  // the payload is flat with known keys, so a targeted field extractor
  // is enough (and never confuses escaped quotes — values we write
  // escape them)
  private def parseRecord(raw: String): Option[LeaseRecord] = {
    def str(k: String) =
      s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(raw)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    def num(k: String) =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(raw).map(_.group(1).toLong)
    for {
      owner <- str("owner"); host <- str("hostname"); pid <- num("pid")
      version <- str("version"); updatedAt <- str("updatedAt")
      revision <- num("revision")
    } yield LeaseRecord(owner, host, pid, version, updatedAt, revision)
  }

  /** Acquire the lease or throw `IllegalStateException` naming the
    * current holder (the reference's "lock %q is already held: %s").
    */
  def acquire(spark: SparkSession, checkpointDir: String,
      version: String): Lease = {
    val path = new Path(checkpointDir, LeaseFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val hostname =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown" }
    val pid = ProcessHandle.current.pid
    val record = LeaseRecord(
      owner = s"$hostname/$pid/${System.nanoTime()}",
      hostname = hostname, pid = pid, version = version,
      updatedAt = java.time.Instant.now.toString, revision = 1L)
    val out =
      try fs.create(path, /* overwrite = */ false)
      catch {
        case e: java.io.IOException =>
          val holder =
            try holderDescription(readFully(fs, path))
            catch { case _: Exception => "owner unknown" }
          throw new IllegalStateException(
            s"lease '$path' is already held: $holder", e)
      }
    try out.write(record.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    new Lease(fs, path, record)
  }

  /** The lease handle: [[Lease.refresh]] bumps revision/updatedAt (the
    * reference's refreshLoop body); [[Lease.release]] deletes the file
    * and tolerates its absence, like runner.go release().
    */
  final class Lease private[CheckpointLease] (fs: FileSystem, path: Path,
      private var rec: LeaseRecord) {
    def record: LeaseRecord = rec
    def refresh(): LeaseRecord = synchronized {
      rec = rec.copy(updatedAt = java.time.Instant.now.toString,
        revision = rec.revision + 1)
      // overwrite-in-place via temp + rename: readers see the old or
      // the new payload, never a torn write
      val tmp = new Path(path.getParent, s"${LeaseFile}.tmp${rec.pid}")
      val out = fs.create(tmp, true)
      try out.write(rec.json.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, path)) {
        fs.delete(path, false)
        if (!fs.rename(tmp, path))
          throw new java.io.IOException(s"refresh lease '$path': rename failed")
      }
      rec
    }
    def release(): Unit =
      try { fs.delete(path, false); () }
      catch { case _: java.io.FileNotFoundException => () }
  }

  /** Ownership report for any checkpoint dir — lease holder (if one is
    * present) plus what Spark's own layout says: the persistent query
    * id (`metadata` file) and the latest offset/commit batch ids. An
    * offsets entry ahead of commits means a batch is in flight (or was
    * interrupted) — the same signal the relay's resume logic trusts.
    */
  final case class Ownership(leaseHolder: Option[String], queryId: Option[String],
      latestOffsetBatch: Option[Long], latestCommitBatch: Option[Long])

  def describe(spark: SparkSession, checkpointDir: String): Ownership = {
    val dir = new Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def latestBatch(sub: String): Option[Long] = {
      val p = new Path(dir, sub)
      if (!fs.exists(p)) None
      else fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .filter(_.forall(_.isDigit))
        .map(_.toLong)
        .maxOption
    }
    val lease = {
      val p = new Path(dir, LeaseFile)
      if (fs.exists(p)) Some(holderDescription(readFully(fs, p))) else None
    }
    val queryId = {
      val p = new Path(dir, "metadata")
      if (!fs.exists(p)) None
      else """"id"\s*:\s*"([0-9a-fA-F-]+)"""".r
        .findFirstMatchIn(readFully(fs, p)).map(_.group(1))
    }
    Ownership(lease, queryId, latestBatch("offsets"), latestBatch("commits"))
  }

  private def readFully(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }
}
