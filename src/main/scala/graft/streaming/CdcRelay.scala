package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.functions.CdcFunctions._

/** The reference's CDC relay (SURVEY.md §2 A1-A16, §3) as a Structured
  * Streaming pipeline:
  *
  *   - A1/A2/A3 ordered scan + resume offset → file streaming source with
  *     the checkpoint's file log as the progress record; a restart
  *     resumes exactly where the last committed epoch left off.
  *   - A4/A5 idle throttle + rate limit → trigger pacing +
  *     `maxFilesPerTrigger`.
  *   - A6-A12 encode/route → the same codegen'd column expressions as the
  *     batch path (one code path, two execution modes).
  *   - A13 broker dedup window → `dropDuplicatesWithinWatermark` keyed by
  *     the deterministic msg-id, bounded by the same 2-minute default
  *     (reference config.go:39).
  *   - A14-A16 publish + ack barrier + chunked checkpoint → `foreachBatch`:
  *     the batch write is the publish, its completion the ack barrier, and
  *     the epoch commit the progress write. Crash between write and
  *     commit ⇒ replay ⇒ at-least-once, deduped downstream — exactly the
  *     reference's contract (README.md:55-61).
  *
  * The sink writes parquet rather than NATS (zero-egress environment —
  * SURVEY.md §7.3); the envelope columns carry subject/headers/msg-id so
  * a broker sink is a drop-in `foreachBatch` replacement.
  */
object CdcRelay {

  /** Relay configuration (the Spark analog of reference config.go). */
  final case class RelayConfig(
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      subjectPrefix: String = "tigerbeetle.cdc",
      clusterId: String = "graft",
      dedupeWindow: String = "2 minutes",
      maxFilesPerTrigger: Int = 16,
      provision: Boolean = true,
      /** Partition the sink by routing subject — the file-sink analog of
        * per-subject NATS streams (A10's routing key as physical
        * layout): consumers of one subject read one directory subtree.
        */
      partitionBySubject: Boolean = false,
      /** Test failpoint: if set, the FIRST epoch written after this flag
        * file is absent crashes the query after the sink write but
        * before the epoch commit — the replay window of the at-least-
        * once contract (reference README.md:55-61).
        */
      crashOnceAfterWrite: Option[String] = None)

  /** Input schema — the `events` stream shape (FIXTURES.md §B). */
  val inputSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The per-event transform — literally the same projection as the
    * batch envelope query (CdcFunctions.envelopeProjection), so batch
    * and streaming outputs cannot drift.
    */
  def transform(df: DataFrame, cfg: RelayConfig): DataFrame =
    envelopeProjection(df, cfg.subjectPrefix, cfg.clusterId)

  /** Start the relay. `Trigger.AvailableNow` drains everything currently
    * in the input dir and stops — the batch-mode analog of the
    * reference's poll loop, and what the resume test uses; pass a
    * processing-time trigger for a long-running relay.
    */
  /** Envelope (output) schema, for sink provisioning/validation. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("msg_id", StringType),
    StructField("subject", StringType),
    StructField("h_content_type", StringType),
    StructField("h_event_type", StringType),
    StructField("h_ledger", StringType),
    StructField("h_transfer_code", StringType),
    StructField("h_debit_account_code", StringType),
    StructField("h_credit_account_code", StringType),
    StructField("body", StringType)))

  def start(spark: SparkSession, cfg: RelayConfig,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // A17 pre-flight: create-or-validate the sink before starting; a
    // divergent sink aborts with the full mismatch list
    val partCols = if (cfg.partitionBySubject) Seq("subject") else Nil
    SinkProvisioner.ensure(spark,
      SinkProvisioner.SinkSpec(cfg.outputDir, envelopeSchema,
        partitionColumns = partCols), cfg.provision)
    val in = spark.readStream
      .schema(inputSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
    val enveloped = transform(in, cfg)
      .withWatermark("ts", cfg.dedupeWindow)
      .dropDuplicatesWithinWatermark("msg_id")
    enveloped.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // publish (write) → ack barrier (write completes) → progress
        // (epoch commit, done by the engine after this returns)
        val writer = batch.write.mode("append")
        (if (cfg.partitionBySubject) writer.partitionBy("subject") else writer)
          .parquet(cfg.outputDir)
        cfg.crashOnceAfterWrite.foreach { flag =>
          val f = new java.io.File(flag)
          if (!f.exists()) {
            f.createNewFile()
            throw new RuntimeException(
              s"injected crash after sink write, before commit of epoch $epochId")
          }
        }
        ()
      }
      .start()
  }
}
