package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.storage.StorageLevel

/** Iterative BPE (byte-pair-encoding) tokenizer training to K merges —
  * the full loop behind the single unrolled round of `text_bpe_merge2`
  * (a production trainer runs hundreds of rounds; the loop, not the
  * round, is the operator).
  *
  * Shape, designed for the 1000-executor case:
  *   - everything runs over the WORD-FORM table (word, freq) — the one
  *     corpus collapse happens before training, so each round's pair
  *     count is vocabulary-bounded, not corpus-bounded.
  *   - a merged pair is replaced by a fresh single char from the
  *     Unicode private-use area (U+E000 + round), so a "symbol" is
  *     always exactly one char and adjacent-pair extraction stays the
  *     cheap `substr(word, i, 2)` scan every round — no array-of-token
  *     representation, no quadratic re-tokenization. `replace()` is
  *     left-to-right non-overlapping, which IS greedy BPE merge
  *     application, and with a fresh marker it is injective: distinct
  *     word forms stay distinct, so frequencies never need regrouping.
  *   - driver state is the merge list only (K rows — the same bounded
  *     contract as [[KMeans.run]]'s k×dim matrix); each round collects
  *     exactly one (pair, count) row.
  *   - each round's merged vocabulary is materialized as a persisted
  *     `RDD[InternalRow]` rooted in a fresh `LogicalRDD` leaf and the
  *     previous round's blocks explicitly freed, so round r's pair
  *     count scans one O(1)-plan relation: no lineage replay, no
  *     chain of nested cache entries (K² analysis + unreclaimable
  *     blocks otherwise — the chained-persist form leaked ~200 MB per
  *     round and OOMed a K=256 run by round ~20).
  */
object Bpe {

  /** One learned merge: `pair` is the raw 2-symbol form (may contain
    * markers of earlier merges), `decoded` the fully expanded surface
    * string, `count` the pair's weighted frequency when it was merged.
    */
  final case class Merge(rank: Int, pair: String, decoded: String, count: Long)

  private[operators] def marker(round: Int): String =
    (0xE000 + round).toChar.toString

  /** Expand every marker in `s` back to its surface form. Replacing in
    * DESCENDING merge order is sufficient: merge r's pair contains only
    * markers < r, so each replacement introduces only markers a later
    * (lower) replacement handles.
    */
  private def decode(s: String, merges: Seq[Merge]): String =
    merges.sortBy(-_.rank).foldLeft(s) { (acc, m) =>
      acc.replace(marker(m.rank - 1), m.pair)
    }

  /** Train `k` merges over `words` (columns `word: String`,
    * `freq: Long`). Stops early if no pair remains (fully merged
    * vocabulary). Returns merges in rank order (rank is 1-based).
    *
    * PRECONDITIONS (enforced loudly — violating either would corrupt
    * merges silently): `k ≤ 6400`, because markers are U+E000+round and
    * round 6400 would walk past U+F8FF out of the BMP private-use area;
    * and no word form may already contain a BMP PUA char, because such
    * a char collides with a marker and breaks the injectivity and
    * decode invariants (a corpus with PUA text must remap those chars
    * before training). For the PUA guard to be COMPLETE, callers must
    * pass the UNFILTERED word-form table: a length-≥2 pre-filter would
    * let a single-char PUA word through the guard yet still collide in
    * the whole-text replaces the encode/vocab/apply queries perform
    * (the corpus tokenizer is a space split, so the unfiltered word set
    * covers every non-space text character). Pair extraction filters
    * length ≥ 2 internally each round, so training semantics don't
    * depend on the caller's filter.
    */
  def train(s: SparkSession, words: DataFrame, k: Int): Seq[Merge] = {
    require(k <= 6400,
      s"k=$k exceeds the 6400 available BMP private-use markers (U+E000..U+F8FF)")
    // Root each round's vocabulary as a SELF-CONTAINED relation: a
    // persisted RDD[InternalRow] wrapped in a LogicalRDD leaf. The
    // naive `persist()`-per-round chain nests round r-1's
    // InMemoryRelation inside round r's cache entry, so the cache
    // manager never reclaims the superseded generations (measured:
    // ~200 MB leaked per round at sf0.1 — OOM by round ~20 of a K=256
    // run). With an explicit RDD root, exactly two generations are
    // ever live and the plan analyzed per round is O(1), not O(r).
    def materialize(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
      // toRdd reuses UnsafeRows — copy before caching. localCheckpoint
      // truncates the RDD lineage once materialized (the new
      // generation then references the cached blocks, NOT the parent
      // RDD chain — an r-deep chain overflows the task-deserialization
      // stack by round ~150), which also makes the explicit unpersist
      // of the superseded generation safe: nothing references it.
      // Tradeoff (documented on RDD.localCheckpoint): losing an
      // executor mid-round forfeits recompute — an iterative trainer
      // on an unreliable cluster would use reliable checkpoint(), as
      // KMeans-style drivers do; rounds here are seconds long.
      val rdd = DatasetBridge.internalRdd(df).map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
        .localCheckpoint()
      rdd.count(): Unit
      (DatasetBridge.ofInternalRows(s, df.schema, rdd), rdd)
    }
    var (vocab, vocabRdd) = materialize(
      words.select(col("word"), col("freq")))
    // one cheap scan of the just-persisted vocabulary (vocabulary-
    // bounded, not corpus-bounded) guards the marker-collision
    // precondition before any merge bakes it in
    val puaWords = vocab.filter(col("word").rlike("[\\uE000-\\uF8FF]")).count()
    require(puaWords == 0L,
      s"$puaWords word forms contain BMP private-use chars " +
        "(U+E000..U+F8FF), which collide with merge markers — remap " +
        "them before training")
    var merges = Vector.empty[Merge]
    var r = 0
    var done = false
    while (r < k && !done) {
      val top = vocab
        .filter(length(col("word")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("p"))
        .groupBy("p").agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("p")).limit(1)
        .collect()
      top.headOption match {
        case None => done = true
        case Some(row) =>
          val (mp, c) = (row.getString(0), row.getLong(1))
          // lit() columns rather than SQL-string interpolation: the pair
          // is corpus text and may contain quotes/backslashes
          val (next, nextRdd) = materialize(vocab
            .withColumn("_mp", lit(mp)).withColumn("_mk", lit(marker(r)))
            .select(expr("replace(word, _mp, _mk)").as("word"), col("freq")))
          vocabRdd.unpersist(blocking = false)
          vocab = next
          vocabRdd = nextRdd
          merges = merges :+ Merge(r + 1, mp, "", c)
          r += 1
      }
    }
    vocabRdd.unpersist(blocking = false)
    // merge m's raw pair can only contain markers of STRICTLY lower
    // ranks, so decoding against the prefix merges.take(rank-1) makes
    // that invariant structural instead of a comment (passing the full
    // list is equivalent — the extra entries' markers never occur —
    // but reads as if it weren't)
    merges.map(m => m.copy(decoded = decode(m.pair, merges.take(m.rank - 1))))
  }
}
