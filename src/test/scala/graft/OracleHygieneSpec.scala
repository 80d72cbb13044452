package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against the Scala object-initialization-order bug class that
  * bit vec_semantic_dedup twice in one day: an eager SQL-string val
  * that interpolates a val declared LATER in the same object silently
  * bakes in `null` (String) or `0` (numeric) — the oracle then either
  * fails to parse or, worse, parses into different semantics
  * (`greatest(0, …)` quietly changed the cluster count). The DuckDB
  * gate catches the value drift one round later; this spec catches the
  * interpolation artifact at build time.
  */
class OracleHygieneSpec extends AnyFunSuite {

  test("no oracle SQL carries a null-String interpolation") {
    // legitimate lowercase nulls are always quoted JSON literals
    // ('null'); a bare token can only come from interpolating an
    // uninitialized String val
    val bare = "(?<!')\\bnull\\b".r
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if bare.findFirstIn(sql).isDefined =>
        val m = bare.findFirstMatchIn(sql).get
        s"$name: …${sql.slice(math.max(0, m.start - 40), m.end + 10).replace('\n', ' ')}…"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("no oracle SQL carries an uninitialized-zero clamp") {
    // greatest(0, …) / least(0, …) in this codebase only ever appear
    // when a numeric constant interpolated as its pre-init default; a
    // future legitimate zero clamp should write the intent differently
    // (e.g. a named CASE) or amend this list
    val zero = "(?i)(greatest|least)\\(0[,)]".r
    // media_phash_neardup's greatest(0, least(255, px + noise)) is the
    // genuine [0, 255] pixel clamp of the DCT stub decode (the Spark
    // twin is math.min/max in DctHashUtil.pixels) — not an
    // uninitialized constant
    val allowed = Set("media_phash_neardup")
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql)
        if !allowed(name) && zero.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("heavy vec oracles: CTE materialization matches reference count") {
    // The r12 driver gate lost vec_ivf_ann / vec_semantic_dedup to DuckDB
    // allocator OOMs. Root cause was materialization discipline: DuckDB
    // inlines PLAIN CTEs as views, so a multiply-referenced plain CTE
    // re-runs its whole subtree per consumer (the unrolled quantizer
    // chain ran 3×), while a MATERIALIZED single-referenced CTE wastes a
    // buffer reservation the pressured checker can't afford. This pins
    // the invariant for the heavy oracles: referenced >1× ⇒ MATERIALIZED,
    // referenced 1× ⇒ plain. (Verified empirically: both oracles now pass
    // under `SET memory_limit='100MB'` via DUCKDB_MEMORY_LIMIT in
    // tools/check.py — the r12 versions needed >100MB / died in the
    // driver's envelope.)
    val heavy = Seq("vec_ivf_ann", "vec_semantic_dedup",
      "vec_hard_negatives_ann")
    val decl = "(?m)^\\s*\\|?\\s*(\\w+) AS (MATERIALIZED )?\\(".r
    for (name <- heavy) {
      val sql = SparkEntry.oracleSql(name)
      val ctes = decl.findAllMatchIn(sql)
        .map(m => m.group(1) -> (m.group(2) != null)).toSeq
      assert(ctes.nonEmpty, s"$name: no CTEs parsed")
      for ((cte, materialized) <- ctes) {
        // a reference is FROM/JOIN/comma-cross-join usage of the CTE
        // name NOT followed by '.', so `, e.embedding` in a SELECT list
        // doesn't count as a use of CTE `e`
        // (?!\s+AS\b) keeps the WITH-list's own `),\nnext AS (`
        // declaration comma from counting as a reference; (?!\s*->)
        // keeps `list_transform(embedding, x -> …)` lambda params out
        val refs = (s"(?i)(\\b(?:from|join)\\s+|,\\s*)$cte\\b" +
          "(?!\\.)(?!\\s+AS\\b)(?!\\s*->)").r
          .findAllIn(sql).size
        if (refs > 1)
          assert(materialized,
            s"$name: CTE $cte referenced $refs× but not MATERIALIZED — " +
              "DuckDB will inline and re-run its subtree per consumer")
        else
          assert(!materialized,
            s"$name: CTE $cte referenced ${refs}× but MATERIALIZED — " +
              "a needless buffer under a memory-pressured checker")
      }
    }
  }

  test("every registered query has either an oracle or a documented gap") {
    // queries without oracleSql get a weaker rows-only driver check;
    // keep that set explicit so an accidentally-dropped oracle is loud
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries missing an oracle entry: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
