package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke stand-in: builds a PLAIN session (no graft-specific
  * confs, exactly like the driver's t1 gate) and checks
  * `SparkEntry.entry` returns rows > 0 on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    df.show(3, truncate = 60)
    assert(n > 0, "entry must return rows")
    println("[smoke] OK")
    spark.stop()
  }
}
