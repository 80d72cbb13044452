package graft.sources

import org.apache.spark.sql.SparkSession

/** Materialized training-dataset sink — the write side of the
  * charter's assembly capstone (`train_assemble`). The layout is what
  * a downstream training job wants to CONSUME at 100 TB, decided at
  * write time so every reader gets it for free:
  *
  *   - `partitionBy(split)`: train/valid/test land in separate
  *     directory subtrees, so an epoch over `split=train` never lists
  *     (let alone reads) eval files — partition pruning, asserted in
  *     TrainExportSpec via the scan's numFiles metric;
  *   - `bucketBy(doc_id)` + `sortBy`: per-doc joins and groupBys on
  *     the exported table (dedup against a new crawl, feature
  *     backfill, example-level joins) consume the bucketing and run
  *     WITHOUT a shuffle — the same co-location contract
  *     PlanQualitySpec pins for the bucketed dedup corpus;
  *   - re-running the export is byte-stable: the assembly's split is a
  *     pure hash of doc_id (no RNG), and `mode(overwrite)` replaces
  *     the table atomically in the catalog.
  */
object TrainExport {

  /** Export the assembled training examples for `sfDir` as `table`,
    * returning the row count written.
    */
  def export(spark: SparkSession, sfDir: String, table: String,
      path: String, buckets: Int = 8): Long = {
    val df = graft.operators.TextQueries.trainAssemble(spark, sfDir)
    df.write.mode("overwrite")
      .partitionBy("split")
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .option("path", path)
      .saveAsTable(table)
    spark.table(table).count()
  }
}
