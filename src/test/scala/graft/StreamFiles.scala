package graft

import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared fixture for file-source streaming specs: land `rows` as ONE
  * parquet file named `name` inside `dir`. Staged under `_stage` and
  * moved in, so the file appears atomically to a running
  * `FileStreamSource` (and `maxFilesPerTrigger=1` maps one call to one
  * micro-batch).
  */
object StreamFiles {
  def writeOneFile(spark: SparkSession, dir: String, name: String,
      rows: Seq[Row], schema: StructType): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new java.io.File(s"$dir/$name").toPath)
  }
}
