package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has carried THREE physical shapes across driver/tool
    * generations, and the loaders below detect which one is stored and
    * normalize to the engine-canonical form — `ts` as a session-UTC
    * TimestampType at microsecond precision:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright
    *    (PARQUET_TYPE_ILLEGAL) unless read as a nanosecond long via the
    *    legacy `nanosAsLong` conf, then rebuilt with
    *    `timestamp_micros(ts div 1000)` (the corpus has zero
    *    sub-microsecond component, so this is exact);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): read natively
    *    as TIMESTAMP_NTZ, cast to TimestampType (an identity on values
    *    under the UTC session timezone every entrypoint pins);
    *  - plain INT64 nanoseconds (GenScale-replicated corpora): same
    *    rebuild as the NANOS shape.
    *
    * Time-range predicates must land on the STORED column — a filter
    * placed after the rebuild (a computed column) cannot reach the
    * parquet reader; [[eventsAfterMicros]] keeps that pushdown in every
    * shape.
    */
  private def eventsStored(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** `events` with `ts` as a raw nanosecond long (converted from the
    * stored shape if needed — only the INT64/NANOS shapes keep the
    * stored column, so don't hang pushdown-sensitive time predicates
    * off this form; use [[eventsAfterMicros]]). */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    val df = eventsStored(spark, sfDir)
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** Events with `ts` strictly after `hwmMicros`, the time predicate
    * compared against the STORED column so it pushes into the parquet
    * scan and prunes row groups/files via min-max stats in every
    * corpus shape; `ts` normalized to TimestampType afterwards. */
  def eventsAfterMicros(spark: SparkSession, sfDir: String,
                        hwmMicros: Long): DataFrame = {
    val df = eventsStored(spark, sfDir)
    df.schema("ts").dataType match {
      case LongType =>
        // micros > hwm  ⟺  nanos >= (hwm+1)*1000 — exact even if the
        // corpus ever carried sub-microsecond components
        df.filter(col("ts") >= lit((hwmMicros + 1L) * 1000L))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        val bound = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(hwmMicros + 1L, 1000000L),
          (Math.floorMod(hwmMicros + 1L, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        df.filter(col("ts") >= lit(bound))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        df.filter(col("ts") >= timestamp_micros(lit(hwmMicros + 1L)))
    }
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val df = eventsStored(spark, sfDir)
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

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
