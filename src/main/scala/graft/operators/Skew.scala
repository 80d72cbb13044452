package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (charter: "salting for skew, AQE for
  * runtime re-plan").
  *
  * Two complementary paths at 100 TB:
  *   - AQE skew-join splits oversized partitions at runtime (asserted
  *     in PlanQualitySpec) — zero code changes, first line of defense;
  *   - explicit salting, below, for the pathological key that exceeds
  *     even a split partition, or for engines/paths where AQE can't see
  *     the skew (e.g. aggregation state, see rel_salted_agg).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `bigKey = smallKey`, salted `factor`
    * ways: big rows scatter across `factor` sub-keys via a
    * deterministic row hash; the small side replicates once per salt.
    * Result set is identical to the plain join; the hot key's rows now
    * land on `factor` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, factor: Int): DataFrame = {
    // salt must disambiguate ROWS, not row contents: replayed/duplicate
    // rows of the hot key would all hash to one salt and defeat the
    // spread. Any salt assignment yields the same join result (the
    // small side is replicated across all salts), so the
    // non-deterministic-across-retries id is safe here.
    val saltCol = pmod(monotonically_increasing_id(), lit(factor))
    val saltedBig = big.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig("__salt") === saltedSmall("__salt") &&
          big(bigKey) === small(smallKey))
      .drop("__salt")
  }
}
