package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Always plain `spark.read.parquet` — scans stay declarative so Catalyst
  * applies column pruning and predicate pushdown into the vectorized
  * Parquet reader; at cluster scale the same call reads a partitioned
  * directory tree with partition pruning for free.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as a nanosecond
    * long via the legacy conf, then rebuild a proper TimestampType at
    * microsecond precision — the corpus has zero sub-microsecond
    * component, so the conversion is exact and matches DuckDB's values.
    */
  /** `events` with `ts` kept as the raw parquet nanosecond long. Scan
    * operators that filter on time use THIS shape so the predicate is a
    * plain comparison on a stored column — pushed into the parquet
    * reader and prunable via row-group min/max stats. A filter placed
    * after the timestamp rebuild (a computed column) cannot push down.
    */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    eventsRawNanos(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
