package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming training-data curation — the continuous-ingest form of the
  * batch `text_curation_funnel`: documents stream in (file drops,
  * `readStream` on any source), each micro-batch is flag-scored with
  * the SAME expressions as the batch pipeline
  * ([[graft.operators.TextQueries.docFlags]]), low-quality and
  * wrong-language docs are cut, and exact duplicates are suppressed
  * across micro-batches by content hash with watermark-bounded state
  * (`dropDuplicatesWithinWatermark`) — so dedup state is evicted once
  * `ingest_ts` passes the window instead of growing forever, the same
  * bounded-state contract the CDC relay's msg-id dedup uses (A13).
  *
  * At scale this is the shape of a continuously-updating corpus: state
  * is keyed by a 128-bit content hash (bytes, not payload), partitioned
  * by the hash, and bounded by the watermark window.
  */
object CurationStream {

  /** Input schema for the file-source form: the batch documents columns
    * plus the producer-stamped ingest time that drives the watermark.
    */
  val inputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Curate a streaming documents frame: flag → filter → windowed
    * exact dedup. Emits one row per first-seen surviving document.
    */
  def curated(docs: DataFrame, dedupeWindow: String = "10 minutes"): DataFrame =
    graft.operators.TextQueries.docFlags(docs)
      .filter(col("pass_lang") && col("pass_quality"))
      .withWatermark("ingest_ts", dedupeWindow)
      .dropDuplicatesWithinWatermark("text_md5")
      .select(col("doc_id"), col("source"), col("text_md5"),
        col("n_tokens"), col("ingest_ts"))
}
