package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for dedup_incremental_near's scale claim: with the
  * BATCH held fixed (the lowest 500 doc_ids, present identically in
  * every GenScale decade — copy 0 is the identity), total cost must
  * track the corpus-proportional index build (one embarrassingly
  * parallel hash pass + df aggregation, amortized to zero in a real
  * deployment where the posting index is a materialized table) while
  * the probe + verify share stays batch-bounded. Prints per rep:
  * index-build seconds (corpus 8-gram hash pass + df cap filter,
  * materialized via count), total pipeline seconds, and output rows.
  * Diagnostic only — not a registered query.
  */
object IncNearDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    for (r <- 1 to reps) {
      // index-build leg alone: corpus 8-gram hash -> df agg -> cap cut
      val t0 = System.nanoTime()
      val corpusDocs = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") >= 500)
      val nRare = corpusDocs
        .select(col("doc_id"),
          explode(call_function("char_ngrams", col("text"), lit(8), lit(true)))
            .as("g8"))
        .select(graft.operators.TextQueries.h60(col("g8")).as("gh"))
        .groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 16)
        .count()
      val tIndex = (System.nanoTime() - t0) / 1e9
      // full pipeline, inverted split: fixed 500-doc batch vs the rest
      val t1 = System.nanoTime()
      val out = graft.operators.TextQueries.incrementalNearSplit(
        spark, sfDir, col("doc_id") >= 500, col("doc_id") < 500)
      val n = out.count()
      val tTotal = (System.nanoTime() - t1) / 1e9
      println(f"[probe] rep=$r docs=$nDocs rare_grams=$nRare " +
        f"t_index=$tIndex%.2f s t_total=$tTotal%.2f s pairs=$n")
    }
    spark.stop()
  }
}
