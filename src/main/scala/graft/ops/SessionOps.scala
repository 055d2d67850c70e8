package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): the batch face of
  * streaming.EventStreamOps.sessionize (SURVEY §2.10 T7 extension) —
  * same inactivity-gap semantics computed set-oriented, so the two
  * formulations cross-check each other (SessionOpsSpec).
  *
  * Shape: one window pass per key ordered by (ts, tiebreak) — lag gives
  * the inter-event gap, a running sum of break flags mints the session
  * index — then a groupBy rollup per (key, session). Scale: exactly ONE
  * shuffle on the key; the rollup reuses the window's hash partitioning
  * (HashPartitioning(key) satisfies the (key, session) clustering), so
  * Catalyst plans no second exchange. Skewed keys (one user with 10⁸
  * events) serialize inside the window sort — at 100 TB bound sessions
  * with a coarse time-bucket pre-split if a single key outgrows a
  * partition.
  */
object SessionOps {

  /** Adds `session_idx` (1-based per key): a new session starts when the
    * gap from the key's previous event exceeds `gapUs`.
    * `tsUsCol` must be integer microseconds (engine-portable — see
    * TemporalQueries scaladoc); `tieCol` breaks ts ties for a total
    * order.
    */
  def withSessionIds(
      df: DataFrame, keyCol: String, tsUsCol: String, gapUs: Long,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol).asc, col(tieCol).asc)
    df.withColumn("__prev_ts", lag(col(tsUsCol), 1).over(w))
      .withColumn("__brk",
        when(col("__prev_ts").isNull ||
          col(tsUsCol) - col("__prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(w))
      .drop("__prev_ts", "__brk")
  }

  /** Per-session rollup: (key, session_idx, start/end µs, event count,
    * value sum in integer cents).
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsUsCol: String, gapUs: Long,
      tieCol: String, valueCol: String): DataFrame =
    withSessionIds(df, keyCol, tsUsCol, gapUs, tieCol)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100, 0).cast("long")).as("value_c"))
}
