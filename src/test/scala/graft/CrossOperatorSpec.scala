package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Cross-operator consistency: independent operators that describe the
  * same corpus must agree with each other. Each invariant here ties
  * two separately-implemented definitions together, so a future edit
  * that drifts one of them fails loudly even while both stay
  * oracle-green in isolation.
  */
class CrossOperatorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("dataset card totals agree with the corpus and the funnel") {
    val card = TextQueries.datasetCard(spark, sf).head()
    val nDocs = Tables.documents(spark, sf).count()
    assert(card.getAs[Long]("n_docs") == nDocs)
    // quality-pass count == the funnel's per-source docs_quality summed
    val funnelPass = TextQueries.curationFunnel(spark, sf)
      .agg(sum(col("docs_quality"))).head().getLong(0)
    assert(card.getAs[Long]("n_pass") == funnelPass)
  }

  test("bag dedup is a coarsening of exact dedup") {
    // identical text implies identical sorted token multiset, so every
    // doc in an exact-dup group must sit in a bag group at least as big
    val docHash = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    val exact = TextQueries.dedupExactText(spark, sf)
      .select(col("text_md5"), col("n_copies"))
    val bag = TextQueries.bagDedup(spark, sf)
      .select(col("doc_id"), col("n_bag"))
    val violations = docHash.join(exact, "text_md5").join(bag, "doc_id")
      .filter(col("n_bag") < col("n_copies")).count()
    assert(violations == 0)
  }

  test("retrieval-agreement sides partition the two pair sets exactly") {
    // n(both) + n(blocking_only) must equal dedup_ngram_jaccard's pair
    // count, n(both) + n(retrieval_only) dedup_rare_gram's — the audit
    // is a partition of the union, not an approximation of it; and
    // every coalesced score is a verified J >= 0.6
    val audit = TextQueries.retrievalAgreement(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nBlocking = TextQueries.ngramJaccard(spark, sf).count()
    val nRetrieval = TextQueries.rareGramRetrieval(spark, sf).count()
    def n(side: String): Long = audit.get(side).map(_._1).getOrElse(0L)
    assert(n("both") + n("blocking_only") == nBlocking)
    assert(n("both") + n("retrieval_only") == nRetrieval)
    audit.values.foreach { case (_, minJ) => assert(minJ >= 0.6) }
  }

  test("recall curve @10 for the LSH index equals vec_ann_recall") {
    val curve = VectorQueries.recallCurve(spark, sf)
      .filter(col("index_name") === "lsh" && col("k") === 10).head()
    val recall = VectorQueries.annRecall(spark, sf).head()
    assert(curve.getAs[Double]("recall") ==
      recall.getAs[Double]("recall_at_10"))
  }

  test("compaction and merge classification agree on history depth") {
    val compactTotal = CdcQueries.compact(spark, sf)
      .agg(sum(col("n_events"))).head().getLong(0)
    val applyTotal = CdcQueries.apply_(spark, sf)
      .agg(sum(col("n_events"))).head().getLong(0)
    val nEvents = Tables.events(spark, sf).count()
    assert(compactTotal == nEvents)
    assert(applyTotal == nEvents)
  }

  test("the SCD2 open interval is exactly the compacted current state") {
    val current = CdcQueries.scd2(spark, sf)
      .filter(col("is_current"))
      .select(col("user_id"), col("event_id"))
    val compacted = CdcQueries.compact(spark, sf)
      .select(col("user_id"), col("last_event_id").as("event_id"))
    assert(current.exceptAll(compacted).count() == 0)
    assert(compacted.exceptAll(current).count() == 0)
  }

  test("token-budget selection never exceeds the budget") {
    val over = TextQueries.tokenBudget(spark, sf)
      .filter(col("tok_kept") > 1000L).count()
    assert(over == 0)
  }

  test("interleave positions realize the mixture's capped weights") {
    // a source with a larger capped weight must never appear LESS often
    // than a smaller-weight source in the first-50 order by more than
    // the stride granularity of 1
    val counts = TextQueries.trainInterleave(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val wts = TextQueries.trainMixture(spark, sf)
      .select(col("source"), col("capped_weight"))
    val joined = counts.join(wts, "source")
      .select(col("capped_weight").as("w"), col("n")).collect()
    for (a <- joined; b <- joined if a.getAs[Double]("w") > b.getAs[Double]("w"))
      assert(a.getAs[Long]("n") >= b.getAs[Long]("n") - 1,
        s"weight ${a.getAs[Double]("w")} got ${a.getAs[Long]("n")} slots, " +
          s"weight ${b.getAs[Double]("w")} got ${b.getAs[Long]("n")}")
  }

  test("trained quantizer assignment matches an independent Scala reimplementation") {
    // semanticAssigned's whole pipeline — micro-long fixing, two Lloyd
    // rounds (HIERARCHICAL argmax assign + exact-integer mean), final
    // hierarchical argmax with (d DESC, id ASC) ties — re-derived here
    // in plain Scala with the same left-associated IEEE dots and
    // HALF_UP rounding. The hierarchy is part of the pinned semantics:
    // supers = first ceil(sqrt(k)) centroids by cid; candidate cells =
    // each fine centroid in its top-2 supers (SemanticCellReplicas)
    // ∪ each super's own seed; a vector scores the cells of its top-8
    // supers (SemanticProbes multiprobe, ranked d DESC / sid ASC).
    // Pins the max(struct(d, -id)) trick to the rank-window semantics
    // the DuckDB oracle uses, independently of either engine.
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val n = rows.length
    val k = math.min(4096, math.max(16, math.ceil(n / 64.0).toInt))
    val ksup = math.ceil(math.sqrt(k.toDouble)).toInt
    val micro = rows.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    }.toMap
    def dot(e: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < e.length) { s += e(i) * c(i); i += 1 }
      s
    }
    def argmax(x: Array[Double], cands: Seq[(Long, Array[Double])]): Long =
      cands.map { case (cid, c) => (r6(dot(x, c)), cid) }
        .minBy { case (d, cid) => (-d, cid) }._2
    def assign(cents: Seq[(Long, Array[Double])]): Map[Long, Long] = {
      val sup = cents.sortBy(_._1).take(ksup)
      def topSup(x: Array[Double], p: Int): Seq[Long] =
        sup.map { case (sid, c) => (r6(dot(x, c)), sid) }
          .sortBy { case (d, sid) => (-d, sid) }.take(p).map(_._2)
      val cells: Map[Long, Seq[(Long, Array[Double])]] = {
        val g = cents.flatMap { case (cid, c) =>
          topSup(c, 2).map(sid => (sid, (cid, c)))
        }
        val seeded = g ++ sup.map { case (sid, c) => (sid, (sid, c)) }
        seeded.groupBy(_._1).map { case (sid, ms) =>
          sid -> ms.map(_._2).distinctBy(_._1)
        }
      }
      rows.map { case (id, e) =>
        val x = e.map(_.toDouble)
        id -> argmax(x, topSup(x, 8).flatMap(cells.getOrElse(_, Nil)))
      }.toMap
    }
    var cents: Seq[(Long, Array[Double])] = rows.take(k)
      .map { case (id, e) => id -> e.map(_.toDouble) }
    for (_ <- 1 to 2) {
      val byCluster = assign(cents).toSeq.groupBy(_._2)
      cents = byCluster.toSeq.sortBy(_._1).map { case (cid, members) =>
        val vs = members.map { case (id, _) => micro(id) }
        val sums = vs.transpose.map(_.sum)
        cid -> sums.map(s => s.toDouble / (vs.size.toDouble * 1e6)).toArray
      }
    }
    val expected = assign(cents)
    val got = VectorQueries.semanticAssigned(spark, sf)
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    val diff = got.filter { case (id, lid) => expected(id) != lid }
    assert(diff.isEmpty, s"${diff.size} mismatched assignments, e.g. ${diff.take(3)}")
  }

  test("ANN-confined mining is dominated by brute-force mining per anchor") {
    // vec_hard_negatives_ann restricts candidates to the anchor's
    // coarse cluster, so its mined sims can never exceed the
    // brute-force miner's global best negative for the same anchor,
    // and every mined negative must carry a label different from the
    // anchor's
    val brute = VectorQueries.queries("vec_hard_negatives")(spark, sf)
      .filter(col("rn") === 1)
      .select(col("q_id"), col("sim").as("best_sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ann = VectorQueries.queries("vec_hard_negatives_ann")(spark, sf)
      .collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val q = r.getAs[Long]("q_id")
      assert(r.getAs[Double]("sim") <= brute(q) + 1e-9,
        s"anchor $q: ANN sim ${r.getAs[Double]("sim")} beats global best ${brute(q)}")
      assert(labels(r.getAs[Long]("neg_id")) != labels(q))
    }
  }

  test("no registered query emits a top-level container column") {
    // The driver's DuckDB/pandas hash-compare factorizes cell values;
    // an ARRAY/MAP/STRUCT column dies in `sort_values` (the exact
    // r10 breakage of text_inverted_index). Every array-producing
    // operator must serialize to a scalar (array_join / concat_ws /
    // to_json) before leaving the registry. Only `.schema` is read,
    // but building a Stage.fanout-backed query eagerly persists +
    // counts + checkpoints its staged relation (Stage.scala), so this
    // walk EXECUTES the heavy stage of every fanout query — acceptable
    // at the sf0.001 fixture, and the price of asserting the real
    // registry entries rather than plan-only doubles.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(bad.isEmpty,
      s"container-typed output columns (driver compare cannot hash " +
        s"them): ${bad.mkString("; ")}")
  }
}
