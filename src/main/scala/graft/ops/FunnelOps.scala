package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over append-only event streams: ordered
  * funnels and cohort retention — the product-analytics faces of the
  * `events` table (reference §3.2's change stream, read analytically).
  *
  * Scale design: both operators reduce the event table per key FIRST
  * (filtered min-aggregates with map-side combine), so everything after
  * the first shuffle moves one row per key — never raw events. All
  * joins are key equi-joins; co-partitioning after the first exchange
  * means Catalyst plans no avoidable second shuffle of the same width.
  */
object FunnelOps {

  /** Ordered funnel: for each key, the earliest qualifying chain
    * through `stages` (event types, in order) where every later stage
    * happens strictly after the previous one and within `horizonUs`
    * microseconds of the FIRST stage (the classic "conversion window
    * anchored at entry" semantics).
    *
    * Chain semantics are greedy-earliest: stage 1 is the key's first
    * stage-1 event; stage i is the first stage-i event after the chosen
    * stage i−1 inside the horizon. Greedy-earliest is NOT maximal (a
    * later stage-1 entry could complete when the earliest doesn't), but
    * it is the standard product-analytics definition and — unlike
    * maximal matching — computes in one filtered min-agg per stage
    * instead of a per-key sequence scan.
    *
    * Plan: stage 1 = filter + groupBy(key).min; each later stage joins
    * the frontier (one row per key) to that stage's filtered (key, ts)
    * stream and takes a conditional min — a key equi-join whose build
    * side shrinks monotonically. k−1 key-partitioned shuffles for a
    * k-stage funnel, each moving a single event type's (key, ts) pairs.
    *
    * Output: one row per key that reached stage 1 —
    * (key, ts_1_us … ts_k_us, stage) with nulls past the reached stage
    * and `stage` = number of stages reached.
    */
  def funnel(
      events: DataFrame, keyCol: String, tsUsCol: String,
      typeCol: String, stages: Seq[String], horizonUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "repeated event types in one funnel are ambiguous")
    require(horizonUs > 0, "horizon must be positive")
    def stageStream(t: String): DataFrame =
      events.filter(col(typeCol) === t)
        .select(col(keyCol).as("__k"), col(tsUsCol).as("__t"))
    var cur = stageStream(stages.head)
      .groupBy(col("__k")).agg(min(col("__t")).as("ts_1_us"))
    stages.zipWithIndex.drop(1).foreach { case (t, i) =>
      val prev = s"ts_${i}_us"
      val cond = col("__t") > col(prev) &&
        col("__t") <= col("ts_1_us") + lit(horizonUs)
      val carried = cur.columns.toIndexedSeq.map(col)
      cur = cur.join(stageStream(t), Seq("__k"), "left")
        .groupBy(carried: _*)
        .agg(min(when(cond, col("__t"))).as(s"ts_${i + 1}_us"))
    }
    val stageNum = (2 to stages.size).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"ts_${i}_us").isNotNull, 1).otherwise(0)
    }
    cur.withColumnRenamed("__k", keyCol)
      .withColumn("stage", stageNum)
  }

  /** Cohort retention matrix: keys are grouped by the `unit`
    * (day/week/month) of their first qualifying event (the cohort —
    * pass `cohortFilter` to anchor on a specific event type, e.g.
    * first purchase); for each (cohort, period offset) the matrix
    * counts how many of the cohort's keys had ANY activity in that
    * period. Forward-looking: activity before a key's cohort period
    * (e.g. browsing before the first purchase) is excluded, so offsets
    * are nonnegative and offset 0 counts the cohort period itself.
    *
    * Plan: first-qualifying-event agg per key (one shuffle of
    * (key, ts) for the filtered type), joined back to the distinct
    * (key, period) activity table — map-side combined at the same
    * width — then one rollup on (cohort, offset). Periods come from
    * `date_trunc` (identical day/ISO-Monday-week semantics in Spark
    * and DuckDB); offsets are exact day differences `div` period
    * length, never timestamp arithmetic.
    *
    * Output: (cohort 'yyyy-MM-dd' string, period_offset, active,
    * cohort_size, retention_milli).
    */
  def cohortRetention(
      events: DataFrame, keyCol: String, tsCol: String,
      unit: String = "week",
      cohortFilter: Option[Column] = None): DataFrame = {
    val periodDays = unit match {
      case "day" => 1L
      case "week" => 7L
      case other => throw new IllegalArgumentException(
        s"unit must be day|week, got $other")
    }
    val div = graft.functions.GraftColumns.longDiv _
    def period(c: Column): Column = to_date(date_trunc(unit, c))
    val qualifying = cohortFilter.map(events.filter).getOrElse(events)
    val firsts = qualifying.groupBy(col(keyCol).as("__k"))
      .agg(min(col(tsCol)).as("__first"))
      .select(col("__k"), period(col("__first")).as("__cohort"))
    val active = events
      .select(col(keyCol).as("__k"), period(col(tsCol)).as("__p"))
      .distinct()
    val sized = firsts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    firsts.join(active, Seq("__k"))
      .filter(col("__p") >= col("__cohort"))
      .groupBy(col("__cohort"),
        div(datediff(col("__p"), col("__cohort")).cast("long"),
          lit(periodDays)).as("period_offset"))
      .agg(count(lit(1)).as("active"))
      .join(sized, Seq("__cohort"))
      .select(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort"),
        col("period_offset"), col("active"), col("cohort_size"),
        div(col("active") * 1000L, col("cohort_size"))
          .as("retention_milli"))
  }
}
