package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Session-health diagnostic: is PARALLEL Spark execution delivering
  * the expected speedup over serial on this machine, right now?
  *
  * Motivated by the round-16 sf1 bench anomaly: CPU-bound queries over
  * 32-file tables ran 3-5× slower than the r14/r15 recordings while
  * single-file (serial-scan) queries stayed flat, controls stayed
  * quiet, and raw-CPU / steal / cgroup / IO probes all came back
  * healthy. This isolates Spark's own scan+agg parallelism: the same
  * aggregation over the same 32-file parquet at local[32] vs local[4]
  * vs local[1], plus a pure-compute (no IO) codegen loop, in fresh
  * sessions within one JVM. Healthy ≈ near-linear scaling to the
  * physical core budget; a flat curve means task-level parallelism is
  * being serialized below Spark.
  *
  *   sbt "runMain graft.tools.ParallelScanProbe [sfDir]"
  */
object ParallelScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    for (threads <- Seq(1, 4, 32)) {
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def timed(what: String)(f: => Unit): Unit = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"probe":"parallel_scan","threads":$threads,""" +
          f""""what":"$what","min_secs":${runs.min}%.2f}""")
      }
      timed("scan_agg") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      timed("pure_cpu") {
        // no IO: a codegen'd per-row expression loop over a range
        spark.range(0, 200000000L, 1, threads)
          .select(sum(expr("id * 2654435761 % 1000000007")))
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
