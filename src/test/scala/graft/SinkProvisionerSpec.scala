package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SinkProvisioner
import graft.streaming.SinkProvisioner.SinkSpec

/** Mirrors the reference's config-diff tests (runner_test.go:10-61): a
  * matching config yields no mismatches; a fully divergent one reports
  * every mismatch; ensure() provisions or fails fast.
  */
class SinkProvisionerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("msg_id", StringType),
    StructField("subject", StringType),
    StructField("body", StringType)))

  test("identical specs produce no mismatches") {
    val s = SinkSpec("/x", schema)
    assert(SinkProvisioner.mismatches(s, s).isEmpty)
  }

  test("every divergence is reported, not just the first") {
    val actual = SinkSpec("/x",
      StructType(Seq(
        StructField("msg_id", LongType),    // wrong type
        StructField("extra", StringType))), // unexpected
      format = "json", partitionColumns = Seq("subject"))
    val desired = SinkSpec("/x", schema)
    val ms = SinkProvisioner.mismatches(actual, desired)
    assert(ms.exists(_.startsWith("format:")))
    assert(ms.exists(_.startsWith("partitioning:")))
    assert(ms.exists(_.startsWith("column type: msg_id")))
    assert(ms.exists(_.startsWith("missing column: subject")))
    assert(ms.exists(_.startsWith("missing column: body")))
    assert(ms.exists(_.startsWith("unexpected column: extra")))
    assert(ms.size == 6)
  }

  test("ensure provisions an absent sink, then validates it clean") {
    val path = Files.createTempDirectory("sink").toString + "/out"
    val spec = SinkSpec(path, schema)
    SinkProvisioner.ensure(spark, spec, provision = true)
    // re-running against the provisioned sink must pass validation
    SinkProvisioner.ensure(spark, spec, provision = false)
  }

  test("partitioned sink provisions then validates clean on restart") {
    val path = Files.createTempDirectory("sinkp").toString + "/out"
    val spec = SinkSpec(path, schema, partitionColumns = Seq("subject"))
    SinkProvisioner.ensure(spark, spec, provision = true)
    // write a real partitioned batch, as the relay would
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
        List(org.apache.spark.sql.Row("m1", "s.a", "b1")).asJava, schema)
      .write.mode("append").partitionBy("subject").parquet(path)
    // restart validation must see the same partitioning, no mismatches
    SinkProvisioner.ensure(spark, spec, provision = false)
    val SinkProvisioner.Present(inspected) = SinkProvisioner.inspect(spark, path)
    assert(inspected.partitionColumns == Seq("subject"))
  }

  test("a provisioned-but-empty partitioned sink validates without data") {
    val path = Files.createTempDirectory("sinkpe").toString + "/out"
    val spec = SinkSpec(path, schema, partitionColumns = Seq("subject"))
    SinkProvisioner.ensure(spark, spec, provision = true)
    // zero-row dynamic-partition writes leave only markers; a restart in
    // validate-only mode must still pass (vacuously), not claim absence
    SinkProvisioner.ensure(spark, spec, provision = false)
  }

  test("unreadable existing data is an abort, never an overwrite") {
    val dir = Files.createTempDirectory("sinkc").toString + "/out"
    new java.io.File(dir).mkdirs()
    val junk = new java.io.File(dir, "data.bin")
    java.nio.file.Files.writeString(junk.toPath, "not parquet at all")
    val spec = SinkSpec(dir, schema)
    val e = intercept[IllegalStateException](
      SinkProvisioner.ensure(spark, spec, provision = true))
    assert(e.getMessage.contains("refusing to touch"))
    // the junk file must still be there — nothing was overwritten
    assert(junk.exists())
  }

  test("ensure fails fast on an absent sink without provision") {
    val spec = SinkSpec(
      Files.createTempDirectory("sink2").toString + "/nope", schema)
    val e = intercept[IllegalStateException](
      SinkProvisioner.ensure(spark, spec, provision = false))
    assert(e.getMessage.contains("does not exist"))
  }

  test("ensure fails with the mismatch list on a divergent sink") {
    val path = Files.createTempDirectory("sink3").toString + "/out"
    SinkProvisioner.ensure(spark, SinkSpec(path, schema), provision = true)
    val divergent = SinkSpec(path, StructType(Seq(
      StructField("msg_id", StringType),
      StructField("subject", IntegerType), // type change
      StructField("body", StringType))))
    val e = intercept[IllegalStateException](
      SinkProvisioner.ensure(spark, divergent, provision = false))
    assert(e.getMessage.contains("column type: subject"))
  }
}
