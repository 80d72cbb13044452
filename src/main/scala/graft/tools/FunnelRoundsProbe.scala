package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round fixed-cost curve of rel_funnel_cycles where the ROUNDS
  * grow (VERDICT r15 #8).
  *
  * The natural corpora pin only the ~5-round regime (GenScale users
  * carry ~30-day histories, so the greedy 7-day-window chain converges
  * in ~5 frontier rounds at EVERY scale — the decade table measures
  * scan growth, not round growth). This probe holds total corpus size
  * constant and sweeps the per-user history span, so wall-time
  * differences isolate the per-round fixed cost (one pushed-down view
  * scan + frontier join + min-agg + localCheckpoint + driver isEmpty
  * probe per round):
  *
  *   users = totalViews / spanWindows, each user gets one view every
  *   8 days (> the 7-day window ⇒ every view opens a NEW cycle, so
  *   rounds = spanWindows + 1 terminal probe), plus a click 1h and a
  *   purchase 2h after every 3rd view to keep stages 2/3 real.
  *
  * Prints one JSON line per operating point:
  *   {"probe":"funnel_rounds","span_windows":K,"rows":N,
  *    "rounds":K,"secs":S,"secs_per_round":S/K}
  *
  *   sbt "runMain graft.tools.FunnelRoundsProbe [totalViews] [spans...]"
  */
object FunnelRoundsProbe {
  def main(args: Array[String]): Unit = {
    val totalViews = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spans = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(5, 10, 20, 40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (span <- spans) {
      val users = math.max(1L, totalViews / span)
      val dir = Files.createTempDirectory(s"funnel-rounds-$span").toString
      val base = lit("2024-01-01 00:00:00").cast("timestamp")
      // 8 days = 691_200_000_000 µs — strictly past the 7-day window,
      // so every view opens a new cycle and rounds == span
      val views = spark.range(users * span)
        .select((col("id") / span).cast("long").as("user_id"),
          (col("id") % span).cast("int").as("k"))
        .select(col("user_id"),
          (unix_micros(base) + col("k").cast("long") * lit(691200000000L))
            .as("ts_us"),
          col("k"))
      val v = views.select(col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), lit("view").as("event_type"),
        col("k"))
      val clicks = v.filter(col("k") % 3 === 0)
        .select(col("user_id"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"),
          lit("click").as("event_type"), col("k"))
      val buys = v.filter(col("k") % 3 === 0)
        .select(col("user_id"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("ts"),
          lit("purchase").as("event_type"), col("k"))
      v.drop("k").unionAll(clicks.drop("k")).unionAll(buys.drop("k"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      // one uncounted warm run would hide the cost a fresh session pays;
      // instead report the median of 3 timed runs like the bench does
      val secs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val out = graft.operators.RelationalQueries.funnelCycles(spark, dir)
        val maxCycle = out.agg(max("cycle")).collect()(0).getInt(0)
        require(maxCycle == span,
          s"expected $span cycles, got $maxCycle")
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      println(f"""{"probe":"funnel_rounds","span_windows":$span,""" +
        f""""rows":${totalViews + 2 * (totalViews / 3)},"rounds":$span,""" +
        f""""secs":$secs%.2f,"secs_per_round":${secs / span}%.3f}""")
    }
    spark.stop()
  }
}
