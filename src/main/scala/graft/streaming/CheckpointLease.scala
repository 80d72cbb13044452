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
  * created via the Hadoop FileSystem API (`create` with
  * overwrite=false — atomic on HDFS; best-effort exists-then-create on
  * the local FS and object stores, which is why the lease is ADVISORY:
  * it guards cooperating graft drivers with fail-fast diagnostics,
  * while Spark's own offset-commit conflict remains the hard backstop
  * and the lease never blocks Spark itself).
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

  /** Default staleness horizon, mirroring the reference's 30 s lock
    * TTL (config.go:37): a holder that has not refreshed within it is
    * presumed dead and its lease is broken on the next acquire.
    */
  val DefaultStaleAfterMs: Long = 30000L

  /** Acquire the lease, taking over a STALE one (holder's `updatedAt`
    * older than `staleAfterMs` — the reference's TTL-expiry semantics,
    * which is what lets restarts recover from a kill -9 that never ran
    * the release path). A live conflict throws `IllegalStateException`
    * naming the holder (the reference's "lock %q is already held: %s").
    */
  def acquire(spark: SparkSession, checkpointDir: String, version: String,
      staleAfterMs: Long = DefaultStaleAfterMs): Lease = {
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
    def tryCreate(): Option[java.io.IOException] =
      try {
        val out = fs.create(path, /* overwrite = */ false)
        try out.write(record.json.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        None
      } catch { case e: java.io.IOException => Some(e) }
    tryCreate() match {
      case None => new Lease(fs, path, record)
      case Some(e) if !fs.exists(path) =>
        // a create failure with NO competing file is a real I/O error
        // (disk full, permissions) — surface it, don't blame a phantom
        // holder
        throw e
      case Some(e) =>
        val raw = try Some(readFully(fs, path)) catch { case _: Exception => None }
        // a torn/unparseable record counts as STALE, same policy as an
        // unparseable timestamp: a kill -9 mid-write must not wedge
        // every future acquire behind an unreadable file
        val stale = raw.flatMap(parseRecord) match {
          case None => true
          case Some(r) =>
            try java.time.Instant.parse(r.updatedAt)
              .isBefore(java.time.Instant.now.minusMillis(staleAfterMs))
            catch { case _: Exception => true }
        }
        if (stale) {
          // break the dead holder's lease and retry ONCE. The delete is
          // guarded: only remove the file if it still carries the SAME
          // payload we judged stale — a competing breaker that already
          // re-created it must see a conflict, not have its fresh lease
          // deleted out from under it. (Check-then-delete is still a
          // window, which is why the lease stays advisory.)
          val unchanged =
            try raw.contains(readFully(fs, path))
            catch { case _: Exception => raw.isEmpty }
          if (unchanged) fs.delete(path, false)
          tryCreate() match {
            case None => new Lease(fs, path, record)
            case Some(e2) =>
              throw new IllegalStateException(
                s"lease '$path' re-acquired concurrently after stale-break",
                e2)
          }
        } else {
          val holder = raw.map(holderDescription).getOrElse("owner unknown")
          throw new IllegalStateException(
            s"lease '$path' is already held: $holder", e)
        }
    }
  }

  /** The lease handle: [[Lease.refresh]] bumps revision/updatedAt (the
    * reference's refreshLoop body); [[Lease.release]] deletes the file
    * and tolerates its absence, like runner.go release().
    */
  final class Lease private[CheckpointLease] (fs: FileSystem, path: Path,
      private var rec: LeaseRecord) {
    def record: LeaseRecord = rec
    /** Refresh = ownership check + overwrite, approximating the
      * reference's KV `Update(revision)` CAS with the primitives a
      * filesystem offers: first VERIFY the on-disk record is still
      * ours — if a stale-break took the lease while this holder was
      * wedged, refreshing must fail (and abort the run, reference
      * runner.go:130-131), not clobber the new owner. The verify→write
      * window is not atomic; the TTL horizon is chosen (30 s vs a
      * sub-second refresh) so a live holder can't be mistaken for
      * stale in that window.
      */
    def refresh(): LeaseRecord = synchronized {
      val current = try Some(readFully(fs, path)) catch { case _: Exception => None }
      current.flatMap(parseRecord) match {
        case Some(r) if r.owner == rec.owner => // still ours
        case other =>
          throw new IllegalStateException(
            s"lease '$path' lost: now ${other.map(_.owner).getOrElse("absent")}")
      }
      rec = rec.copy(updatedAt = java.time.Instant.now.toString,
        revision = rec.revision + 1)
      val out = fs.create(path, true)
      try out.write(rec.json.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      rec
    }
    /** Ownership-checked delete: a USURPED holder's shutdown (stale
      * break happened while it was wedged; its refresh already threw)
      * must not destroy the new owner's live lease — only the record
      * we actually wrote gets removed. Tolerates absence, like the
      * reference's Delete (runner.go:718-724).
      */
    def release(): Unit =
      try {
        val ours = parseRecord(readFully(fs, path)).exists(_.owner == rec.owner)
        if (ours) { fs.delete(path, false); () }
      } catch { case _: Exception => () }
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
