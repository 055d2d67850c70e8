package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series monitoring over aggregated event streams: CUSUM change
  * detection on per-period counts/sums — the data-quality watchdog for
  * an ingestion pipeline (a scraper going dark or double-feeding shows
  * up as a sustained count shift long before a single-period threshold
  * trips).
  */
object SeriesOps {

  /** One-sided CUSUM over a regular series: s_t = max(0, s_{t−1} +
    * (x_t − target)) accumulates SUSTAINED positive deviation from the
    * per-series target (Page 1954); run it on the negated deviation
    * (swap x for 2·target − x upstream) for the drop-detection side.
    * Flags periods where s_t > k·target.
    *
    * The recurrence looks inherently sequential, but
    * s_t = cum_t − min(0, cum_1..t) for cum = running Σ(x − target) —
    * so the whole detector is TWO plain window passes (running sum,
    * running min) over the per-series period rollup. No stateful scan,
    * no driver loop; the window partition is one row per period,
    * bounded by the calendar range, not the event volume. The target
    * (per-series mean period value, integer div) folds in as a
    * ride-along window aggregate — deterministic integer end to end.
    *
    * Input must be ONE row per (series, period) — aggregate first —
    * with a NONNEGATIVE integer `valueCol` (counts/sums; integer-div
    * target semantics assume it).
    * Output: (series, period, x, target, cusum, flagged).
    */
  def cusum(
      perPeriod: DataFrame, seriesCol: String, periodCol: String,
      valueCol: String, kMilli: Long = 2000L): DataFrame = {
    require(kMilli >= 0, "k is per-mille of target")
    val div = graft.functions.GraftColumns.longDiv _
    val byPeriod = Window.partitionBy(col(seriesCol))
      .orderBy(col(periodCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(seriesCol))
    perPeriod
      .withColumn("__target",
        div(sum(col(valueCol)).over(whole), count(lit(1)).over(whole)))
      .withColumn("__cum",
        sum(col(valueCol) - col("__target")).over(byPeriod))
      .withColumn("__runmin",
        least(min(col("__cum")).over(byPeriod), lit(0L)))
      .select(col(seriesCol), col(periodCol),
        col(valueCol).as("x"), col("__target").as("target"),
        (col("__cum") - col("__runmin")).as("cusum"))
      .withColumn("flagged",
        col("cusum") * 1000L > lit(kMilli) * col("target"))
  }
}
