package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training-rate probe (SCALING.md §Bpe.train): time
  * [[graft.operators.Bpe.train]] to K merges over the sf corpus's
  * word-form table and report merges/sec — the number a tokenizer-
  * training run plans against (a production trainer runs hundreds of
  * rounds; each round here is one vocabulary-bounded pair count + one
  * top-1 collect + one marker replace, so the rate should be ~flat in
  * K and ~independent of corpus size once the corpus has collapsed to
  * word forms).
  *
  *   sbt "runMain graft.tools.BpeRate [sfDir] [k]"
  *
  * Prints one JSON line: corpus size, word-form count, K, total secs,
  * merges/sec, and the first/last learned merges as a sanity probe.
  */
object BpeRate {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    // the one corpus collapse (same word-form derivation as
    // text_bpe_pairs): training never re-touches the corpus
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .persist()
    val nForms = words.count()

    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.train(spark, words, k)
    val secs = (System.nanoTime() - t0) / 1e9
    words.unpersist()

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", v)
    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"word_forms":$nForms,"k":$k,"merges_learned":${merges.size},"secs":${num(secs)},"merges_per_sec":${num(merges.size / secs)},"top_merge":"${merges.headOption.map(_.decoded).getOrElse("")}","last_merge":"${merges.lastOption.map(_.decoded).getOrElse("")}"}""")
    spark.stop()
  }
}
