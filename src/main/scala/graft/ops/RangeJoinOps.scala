package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join without the cross-join trap.
  *
  * Naive `points JOIN intervals ON t BETWEEN s AND e` has no equi-key,
  * so Spark plans a (broadcast) nested-loop — O(|P|·|I|) compares, dead
  * at scale. Binning restores an equi-key: a point lives in exactly one
  * time bin, an interval covers its bin range, and containment can only
  * happen when bins collide. The join becomes
  * `(key, bin)` equi-join → shuffle-partitionable, AQE-skew-splittable,
  * with per-pair work bounded by interval_span/binWidth fan-out.
  * Each qualifying (point, interval) pair meets in exactly ONE bin (the
  * point's), so no post-join dedup is needed.
  *
  * Pick binWidth ≈ typical interval length: fan-out stays O(1) per
  * interval and bin collisions stay selective.
  */
object RangeJoinOps {

  /** Inner join of `points` (at `tCol`) to every interval in
    * `intervals` whose `[startCol, endCol]` contains it, co-keyed on
    * `on`. `tCol`/`startCol`/`endCol` must be integral (e.g. epoch
    * micros). Output: `on` ++ point columns ++ interval columns.
    */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame, on: Seq[String],
      tCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pB = points.withColumn("__bin",
      floor(col(tCol) / binWidth).cast("long"))
    val iB = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    pB.join(iB, on :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }
}
