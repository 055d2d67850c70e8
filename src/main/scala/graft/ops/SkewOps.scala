package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin` splits
  * oversized shuffle partitions at runtime — on by default in our
  * mains). Salting is the explicit fallback for the cases AQE can't
  * rebalance: a single key so hot one task owns it, or non-shuffle
  * stages downstream of the join.
  *
  * `saltedEquiJoin` spreads each big-side row across `nSalts` shuffle
  * partitions deterministically (hash of the whole row, not rand() —
  * retries/speculative tasks must route rows identically or results
  * duplicate), and replicates the small side once per salt. Output
  * equals the plain equi-join row-for-row (spec-checked).
  */
object SkewOps {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted
    * `nSalts` ways. Small side must be join-unique on `keys` or simply
    * small enough that replicating it `nSalts`× is acceptable.
    */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(nSalts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt — for skewed group keys
    * feeding a non-algebraic aggregate where Catalyst's partial-agg
    * (map-side combine) can't shrink the hot key's shuffle volume
    * (e.g. collect_list). Phase 1 aggregates (key, salt); phase 2 merges
    * the per-salt partials. `merge` must be associative on the phase-1
    * output column.
    */
  def saltedCollectList(
      df: DataFrame, key: String, value: String, nSalts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(value)), lit(nSalts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("__partial"))))
        .as(s"${value}s"))
}
