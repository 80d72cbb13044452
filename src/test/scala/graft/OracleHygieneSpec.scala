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

  test("no oracle SQL uses the fold-fragile `+ 0.0` zero-sign idiom") {
    // r13's fix appended `+ 0.0` to round() (IEEE: -0.0 + 0.0 = +0.0),
    // but `x + 0.0 -> x` is a standard arithmetic-simplification rewrite
    // — a DuckDB build that applies it resurrects the -0.0 the idiom
    // exists to remove, which is exactly the r14 driver signature
    // (bit-exact locally, red at the driver). The idiom is therefore
    // BANNED; use the fold-proof CASE form checked by the next test.
    // The single sanctioned exception is the diag_zero_sign canary,
    // whose entire purpose is to carry the fragile expression so the
    // driver itself adjudicates whether its build folds it.
    // digit boundary so legitimate constants (`+ 0.05`, `+ 0.01`) don't
    // false-flag — only a bare `+ 0.0` is the fold-fragile idiom
    val fragile = "\\+\\s*0\\.0(?![0-9])".r
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if name != "diag_zero_sign" &&
        fragile.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty,
      s"fold-fragile `+ 0.0` in oracle SQL (use CASE WHEN round(x) = 0 " +
        s"THEN 0.0 ELSE round(x) END): ${bad.mkString(", ")}")
  }

  test("every double round() feeding an output alias is sign-of-zero-normalized") {
    // DuckDB's round(DOUBLE, n) keeps the IEEE sign bit, while Spark's
    // round / Java BigDecimal normalize -0.0 to +0.0 — and the driver's
    // hash is bit-sensitive. A tiny negative value that rounds to zero
    // therefore ships as the oracle's -0.0 vs the engine's +0.0: the
    // exact one-cell failure that made vec_covariance r13's and r14's
    // only red row. The structural rule: every oracle round(...) that
    // feeds an output alias — directly or via any trailing arithmetic —
    // must be wrapped in the fold-proof normalization
    //   CASE WHEN round(x, k) = 0 THEN 0.0 ELSE round(x, k) END
    // (`-0.0 = 0` is true, so the THEN branch returns literal +0.0;
    // CASE branches are never arithmetic-simplified, unlike the banned
    // `+ 0.0` form; NaN takes ELSE and NULL stays NULL, same as before).
    // In that form the THEN-side round is followed by `= 0` and the
    // ELSE-side round by `END AS …`, so neither matches the violation
    // pattern below. Integer-cast rounds (CAST(round(x) AS BIGINT))
    // have no signed zero and are exempt.
    val typeKw = Set("BIGINT", "INT", "INTEGER", "HUGEINT", "DOUBLE",
      "DECIMAL", "VARCHAR", "SMALLINT", "TINYINT", "UBIGINT", "FLOAT",
      "REAL", "DATE", "TIMESTAMP", "BOOLEAN")
    // a round() feeding an alias is a violation whether bare
    // (`round(x) AS a`) or behind the banned idiom (`round(x) + 0.0 AS a`)
    val asAlias = "^\\s*(?:\\+\\s*0\\.0\\s*)?AS\\s+(\\w+)".r
    def violations(sql: String): Seq[String] = {
      val low = sql.toLowerCase
      val out = Seq.newBuilder[String]
      var i = 0
      var k = low.indexOf("round(", i)
      while (k >= 0) {
        val partOfIdent = k > 0 && {
          val c = low.charAt(k - 1)
          c.isLetterOrDigit || c == '_' || c == '.'
        }
        // balanced-paren scan from round's '('
        var d = 0
        var j = k + 5
        while (j < sql.length && { sql.charAt(j) match {
          case '(' => d += 1; true
          case ')' => d -= 1; d != 0
          case _ => true
        }}) j += 1
        if (!partOfIdent && j < sql.length) {
          val after = sql.substring(j + 1)
          asAlias.findFirstMatchIn(after).foreach { m =>
            val alias = m.group(1).toUpperCase
            if (!typeKw(alias))
              out += s"${sql.slice(k, j + 1).replace('\n', ' ').take(60)} AS ${m.group(1)}"
          }
        }
        i = j + 1
        k = if (i < low.length) low.indexOf("round(", i) else -1
      }
      out.result()
    }
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if name != "diag_zero_sign" =>
        violations(sql).map(v => s"$name: $v")
      case _ => Nil
    }
    assert(bad.isEmpty,
      s"un-normalized double round() feeding an output alias (wrap in " +
        s"CASE WHEN round(x) = 0 THEN 0.0 ELSE round(x) END):\n${bad.mkString("\n")}")
  }

  test("every registered query has either an oracle or a documented gap") {
    // queries without oracleSql get a weaker rows-only driver check;
    // keep that set explicit so an accidentally-dropped oracle is loud
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries missing an oracle entry: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
