package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators. The reference has no temporal joins (SURVEY
  * §2.3: equi-joins only); these extend the engine for event-stream
  * analytics at scale.
  */
object TemporalOps {

  /** As-of join: pair every left row with the single nearest right row
    * per key — at-or-before `leftTs` (`direction="backward"`, the
    * default) or at-or-after (`"forward"`).
    *
    * Shape (the scale property): tag both sides, union, ONE shuffle on
    * `on` keys, one sort, one window pass carrying the latest right
    * payload forward (`last(..., ignoreNulls)`); no range-join row
    * explosion, no per-key driver loop. This is the sort-merge
    * formulation every columnar engine uses for ASOF JOIN.
    *
    * Contract: right value columns (everything but `on` ++ `rightTs`)
    * must not collide with left column names; rows with equal
    * (key, ts) on BOTH sides match (right sorts before left at equal
    * ts); if multiple right rows share (key, rightTs) the winner is
    * unspecified — dedup first for determinism. Unmatched left rows
    * keep null right columns (left-outer semantics).
    *
    * @param matchedTsCol when set, emit the matched right timestamp
    *   under this name (for staleness filtering downstream).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      on: Seq[String], leftTs: String, rightTs: String,
      direction: String = "backward",
      matchedTsCol: Option[String] = None): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"unsupported direction: $direction")
    val leftPayload = left.columns.filterNot(on.contains).toSeq
    val rightPayload = right.columns
      .filterNot(c => on.contains(c) || c == rightTs).toSeq
    val collisions = rightPayload.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right value columns collide with left: $collisions")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // The right payload travels as ONE struct: carrying columns
    // independently could stitch values from different right rows when
    // right data itself contains nulls (last(_, ignoreNulls) skips
    // them per column); a struct is non-null per right row, so the
    // carry is atomic.
    val rPack = struct(
      (rightPayload.map(col) :+ col(rightTs).as("__rts")): _*)
    val rPackType = right.select(rPack.as("__rpack")).schema("__rpack").dataType

    val lTagged = left.select(
      on.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rPackType).as("__rpack"): _*)
    val rTagged = right.select(
      on.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftPayload.map(c => nullOf(left, c)) :+
        rPack.as("__rpack"): _*)

    val ord =
      if (direction == "backward") Seq(col("__ts").asc, col("__side").asc)
      else Seq(col("__ts").desc, col("__side").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("__rpack", last(col("__rpack"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(
        on.map(col) ++ leftPayload.map(col) ++
          rightPayload.map(c => col("__rpack").getField(c).as(c)) ++
          matchedTsCol.map(n => col("__rpack").getField("__rts").as(n))
            .toSeq: _*)
  }

  /** Incremental rollup maintenance: merge a stored pre-aggregated
    * rollup with a freshly aggregated delta, without rescanning the
    * history. Both inputs carry the SAME schema — `keys` plus
    * summable state columns (`sumCols`) — and the merge is just
    * re-aggregation of the partials: sum-of-sums, sum-of-counts.
    *
    * This is the 100 TB pattern for any algebraic aggregate: keep
    * (sum, count, min/max…) as the stored state, derive avg & co at
    * read time, and each refresh touches only the delta partition.
    * Non-algebraic state (distinct sets, exact medians) can't be
    * maintained this way — use sketches or recompute.
    *
    * The merged result is bit-identical to aggregating the full input
    * in one pass (addition is associative over BIGINT state) — which
    * is exactly what the conformance oracle checks.
    */
  def mergeRollup(
      prev: DataFrame, delta: DataFrame,
      keys: Seq[String], sumCols: Seq[String]): DataFrame =
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** SCD2 interval build: turn a per-key version log (one row per
    * version event) into validity intervals — valid_from = the row's
    * timestamp, valid_to = the NEXT version's timestamp (null while
    * current), is_current on the open row. The warehousing read shape
    * for "what was true at time T" joins (pairs with [[asofJoin]],
    * which consumes exactly such logs).
    *
    * One window over (key, ts, tiebreak) — a single shuffle on the key;
    * the tiebreak column makes interval boundaries deterministic under
    * same-timestamp versions.
    */
  def scd2Intervals(
      df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Interval-union coverage: merge overlapping/touching [start, end)
    * intervals per key and report the union — n_islands and total
    * covered length — the "total active time" / "total on-call
    * coverage" readout that double-counting Σ(end−start) gets wrong.
    *
    * Classic island detection as TWO window passes over one per-key
    * shuffle: a running max of prior ends (rowsBetween −∞..−1) marks a
    * new island exactly when start &gt; every earlier end (start-sorted
    * ⇒ earlier rows are the only overlap candidates); the island id is
    * the running sum of those break flags; islands then aggregate to
    * (min start, max end). Touching intervals (start == prev end)
    * MERGE — [start, end) semantics. Deterministic under same-start
    * rows: the running max is order-insensitive within ties because
    * max is commutative over the tied prefix... with the end column as
    * secondary sort the prefix set itself is order-pinned.
    *
    * Input columns must be integral (epoch seconds/micros). Output:
    * one row per key: (key, n_intervals, n_islands, covered).
    */
  def intervalUnion(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__prevEnd", max(col(endCol)).over(prev))
      .withColumn("__break",
        when(col("__prevEnd").isNull || col(startCol) > col("__prevEnd"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__break")).over(run))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__n"), min(col(startCol)).as("__s"),
        max(col(endCol)).as("__e"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered"))
  }
}
