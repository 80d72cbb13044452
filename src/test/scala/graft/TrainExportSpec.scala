package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TrainExport

/** The exported training table must deliver its two layout promises:
  * split-partition pruning on read, and shuffle-free bucketed
  * aggregation/join on doc_id.
  */
class TrainExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("export partitions by split and buckets by doc_id") {
    val root = java.nio.file.Files.createTempDirectory("texport").toString
    val n = TrainExport.export(spark, sf, "train_ex", s"$root/train_ex")
    try {
      assert(n > 0)
      // physical layout: one subtree per split value
      val splits = new java.io.File(s"$root/train_ex").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("split="))
      assert(splits.contains("split=train"), splits.toSeq)

      // partition pruning: a split=train read touches only that
      // subtree's files (numFiles metric — inputFiles lists unpruned)
      val trainOnly = spark.table("train_ex")
        .filter(col("split") === "train").select("doc_id", "label")
      trainOnly.collect()
      val scan = trainOnly.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .get
      val trainFiles = new java.io.File(s"$root/train_ex/split=train")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(scan.metrics("numFiles").value == trainFiles,
        s"read ${scan.metrics("numFiles").value} files, " +
          s"split=train holds $trainFiles")

      // bucketed consumption: a doc_id groupBy over the table runs
      // without an exchange (same promise as the dedup corpus layout)
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val agg = spark.table("train_ex")
          .groupBy("doc_id").agg(count(lit(1)).as("n"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"), plan)
        assert(agg.collect().nonEmpty)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      }

      // determinism: a second export writes the same example set
      val first = spark.table("train_ex").orderBy("doc_id").collect().toSeq
      TrainExport.export(spark, sf, "train_ex", s"$root/train_ex2")
      val second = spark.table("train_ex").orderBy("doc_id").collect().toSeq
      assert(first == second, "re-export must be byte-stable")
    } finally spark.sql("DROP TABLE IF EXISTS train_ex")
  }
}
