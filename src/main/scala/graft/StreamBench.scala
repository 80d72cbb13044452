package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming._

/** Stateful-stream throughput for the bench artifact: drives ALL nine
  * non-relay streams (compaction, attribution, sessionize, incremental
  * dedup, sketch, curation, decontaminate, media features, ANN
  * serving) over
  * the sf tables staged as micro-batch files — several triggers each,
  * the same file-per-source-batch shape the relay bench uses — and
  * reports rows/sec plus end-of-run state rows. For ann_serve the rate
  * is QUERIES served per second against the full corpus index, not
  * ingest throughput.
  *
  * State rows come from the state store's own progress metrics for the
  * flatMapGroupsWithState / watermark-dedup streams (what a cluster
  * operator watches for unbounded-state leaks), and from the external
  * store for the foreachBatch streams (hash rows; sketch cells, which
  * being CONSTANT is the sketch's whole scale story).
  */
object StreamBench {

  /** name -> (rows_per_sec, state_rows). `SPARK_GRAFT_STREAMS` (comma-
    * separated names) measures a subset — re-measuring one stream after
    * a fix shouldn't cost the full nine-stream sweep.
    */
  def run(spark: SparkSession, sfDir: String): Map[String, (Double, Long)] = {
    val onlyStreams = sys.env.get("SPARK_GRAFT_STREAMS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = onlyStreams.forall(_.contains(name))
    val out = scala.collection.mutable.Map[String, (Double, Long)]()
    val root = java.nio.file.Files.createTempDirectory("bench-streams").toString
    import spark.implicits._

    // stage events and documents once, ~4096 rows per file so
    // maxFilesPerTrigger yields several genuine micro-batches; LAZY so
    // a SPARK_GRAFT_STREAMS subset run stages only what it measures
    lazy val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    lazy val nEv = ev.count()
    // event-time-ordered staging (file i = i-th ts range), the ordered
    // CDC input contract — random staging makes every later trigger's
    // rows below-watermark "late" for the sessionize stream (see the
    // relay staging note in Bench.scala)
    lazy val evSchema = {
      ev.repartitionByRange(math.max(1, math.ceil(nEv / 4096.0).toInt),
          col("ts"))
        .sortWithinPartitions("ts").write.parquet(s"$root/events")
      Stage.orderStagedFiles(s"$root/events")
      spark.read.parquet(s"$root/events").schema
    }

    lazy val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"),
        // producer-stamped ingest time for the curation watermark:
        // deterministic, monotone-ish in doc_id
        timestamp_micros(lit(1700000000000000L) +
          col("doc_id") * 1000000L).as("ingest_ts"))
    lazy val nDocs = docs.count()
    // ingest_ts is monotone in doc_id, so range-stage by doc_id for the
    // same ordered-arrival contract (curation's watermark)
    lazy val docSchema = {
      docs.repartitionByRange(math.max(1, math.ceil(nDocs / 1024.0).toInt),
          col("doc_id"))
        .sortWithinPartitions("doc_id").write.parquet(s"$root/docs")
      Stage.orderStagedFiles(s"$root/docs")
      spark.read.parquet(s"$root/docs").schema
    }

    /** Time a stream to completion; stateRows reads the finished query
      * (progress metrics) or the external store. The timed window closes
      * at processAllAvailable() — the state probe (which may itself be a
      * full parquet count of an external store) runs OUTSIDE it, so
      * rows_per_sec is comparable across foreachBatch and state-store
      * streams.
      */
    // excludeBuild: for streams whose start() performs a ONE-TIME index
    // build (ann_serve trains the coarse quantizer and materializes the
    // assigned corpus before batch 1), the build is deploy-time cost,
    // not serving cost — charging it to rows/sec would make the rate a
    // function of how few queries the bench happens to stream. The
    // build time is printed separately instead of silently dropped.
    def measure(name: String, rows: => Long, excludeBuild: Boolean = false)(
        build: () => StreamingQuery)(
        stateRows: StreamingQuery => Long): Unit =
      if (wanted(name)) try {
        val tBuild = System.nanoTime()
        val q = build()
        val t0 = if (excludeBuild) {
          System.err.println(String.format(java.util.Locale.ROOT,
            "[bench] %s index build %.1f s (excluded from rate)",
            name, ((System.nanoTime() - tBuild) / 1e9).asInstanceOf[AnyRef]))
          System.nanoTime()
        } else tBuild
        val (secs, st) =
          try {
            q.processAllAvailable()
            val elapsed = (System.nanoTime() - t0) / 1e9
            (elapsed, stateRows(q))
          } finally q.stop()
        out(name) = (rows / secs, st)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] stream $name failed: ${e.getMessage}")
      }

    def storeStateRows(q: StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum)
        .getOrElse(0L)

    measure("compaction", nEv) { () =>
      CompactionStream.start(
        spark.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$root/events")
          .as[CompactionStream.Event],
        s"$root/compact_out", s"$root/compact_chk")
    }(storeStateRows)

    measure("attribution", nEv) { () =>
      AttributionStream.start(
        spark.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$root/events")
          .as[AttributionStream.Event],
        s"$root/attr_out", s"$root/attr_chk")
    }(storeStateRows)

    measure("sessionize", nEv) { () =>
      SessionizeStream.sessions(
        spark.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$root/events")
          .select(col("user_id"), col("ts")).as[SessionizeStream.Event])
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/sess_chk")
        .outputMode("append").start()
    }(storeStateRows)

    measure("incremental_dedup", nDocs) { () =>
      IncrementalDedupStream.start(spark,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/docs")
          .select("doc_id", "text"),
        s"$root/incdedup_out", s"$root/incdedup_store", s"$root/incdedup_chk")
    }(_ => spark.read.parquet(s"$root/incdedup_store").count())

    measure("sketch", nDocs) { () =>
      SketchStream.start(spark,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/docs")
          .select("text"),
        s"$root/sketch_out", s"$root/sketch_chk")
    }(_ => graft.functions.CountMin.Agg.zero.length.toLong) // constant cells

    measure("curation", nDocs) { () =>
      CurationStream.curated(
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/docs"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/cur_chk")
        .outputMode("append").start()
    }(storeStateRows)

    // Resident state here is the STATIC eval-set cache — bounded by the
    // benchmark corpus, not the crawl; there is no keyed state store
    // (DecontaminateStreamSpec pins that under a two-era replay). The
    // probe used to count the OUTPUT sink, which read as unbounded
    // "state" growth when it is simply the product.
    lazy val evalHashRows = graft.operators.TextQueries
      .passageHashes(Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 13 === 0), stride = 1)
      .select("ph").distinct().count()
    measure("decontaminate", nDocs) { () =>
      DecontaminateStream.start(spark,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/docs")
          .select("doc_id", "text"),
        sfDir, s"$root/decon_out", s"$root/decon_chk")
    }(_ => evalHashRows)

    measure("media_features", nDocs) { () =>
      MediaFeatureStream.start(
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/docs")
          .select(
            col("doc_id").as("media_id"),
            element_at(array(lit("png"), lit("jpeg"), lit("wav")),
              (col("doc_id") % 3 + 1).cast("int")).as("format"),
            col("text").cast("binary").as("content"),
            (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
            (lit(48) + (col("doc_id") % 5) * 16).cast("int").as("height"),
            (lit(1) + col("doc_id") % 30).cast("int").as("n_frames"))
          .as[graft.operators.MultimodalQueries.MediaIn],
        s"$root/media_out", s"$root/media_chk")
    }(storeStateRows) // stateless map stream: no store, sink = product

    // ANN serving: a query stream against the full corpus index —
    // rows/sec here is QUERIES served per second, not ingest
    // throughput. The default 64-query load keeps the committed
    // artifact comparable across rounds; at that load BOTH serving
    // paths are per-micro-batch-overhead-bound (~1 s scheduling +
    // sink + commit per batch), so the cell-confined index's compute
    // advantage only becomes visible at production batch sizes —
    // SPARK_GRAFT_ANN_QUERIES raises the load and
    // SPARK_GRAFT_ANN_NPROBE=0 selects the brute path for the A/B
    // (SCALING.md §ANN serving crossover).
    lazy val annQueries = sys.env.get("SPARK_GRAFT_ANN_QUERIES")
      .map(_.toInt).getOrElse(64)
    lazy val annNprobe = sys.env.get("SPARK_GRAFT_ANN_NPROBE")
      .map(_.toInt).getOrElse(AnnStream.DefaultNprobe)
    lazy val qs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < annQueries)
      .select(col("vec_id").as("q_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))")
          .as("q_embedding"))
    lazy val nQ = qs.count()
    lazy val qSchema = {
      qs.repartition(8).write.parquet(s"$root/queries")
      spark.read.parquet(s"$root/queries").schema
    }

    measure("ann_serve", nQ, excludeBuild = true) { () =>
      AnnStream.start(spark,
        spark.readStream.schema(qSchema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/queries"),
        sfDir, s"$root/ann_out", s"$root/ann_chk", nprobe = annNprobe)
    }(_ => spark.read.parquet(s"$root/ann_out").count())

    Stage.deleteRecursively(new java.io.File(root))
    out.toMap
  }
}
