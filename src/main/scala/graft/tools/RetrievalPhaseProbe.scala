package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level timing of dedup_retrieval_agreement's staged
  * orchestration: runs the composite with a listener-free wall clock
  * around each materialization barrier (the persists/checkpoints are
  * the phase boundaries), so the single-pass refactor's savings are
  * attributable. Diagnostic only — not a registered query.
  */
object RetrievalPhaseProbe {
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
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.operators.TextQueries.retrievalAgreement(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep=$r total=$sec%.2f s rows=$n")
    }
    spark.stop()
  }
}
