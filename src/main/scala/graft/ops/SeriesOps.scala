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

  /** Per-series ordinary-least-squares trend over a period rollup:
    * slope/intercept from the four sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) — ONE map-side-combined aggregation per
    * series, no window, no matrix library:
    *
    *   slope·1e6     = (n·Σxy − Σx·Σy)·1e6 div (n·Σx² − Σx·Σx)
    *   intercept·1e6 = (Σy·1e6 − slope_micro·Σx) div n
    *
    * All-integer (div truncates toward zero identically on Spark and
    * DuckDB, negatives included), so any engine replays every bit.
    * Degenerate series (a single distinct x) → NULL slope/intercept.
    * Intercept reuses the ROUNDED slope (documented; keeps the whole
    * result integral instead of carrying a rational pair).
    *
    * Input: ONE row per (series, x) — aggregate first (the q169
    * contract). Overflow bound: |n·Σxy| &lt; 2^63 needs
    * n·max|x|·Σ|y| &lt; 9.2e18 — a 3-year daily rollup (n≈1000,
    * x≈1000) holds to Σ|y| ≈ 9e12; rescale y upstream beyond that.
    */
  def olsTrend(
      perPeriod: DataFrame, seriesCol: String, xCol: String,
      yCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    perPeriod
      .groupBy(col(seriesCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .withColumn("__den", col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope_micro",
        when(col("__den") > 0L,
          div((col("n") * col("__sxy") - col("__sx") * col("__sy")) * 1000000L,
            col("__den"))))
      .withColumn("intercept_micro",
        when(col("__den") > 0L,
          div(col("__sy") * 1000000L - col("slope_micro") * col("__sx"),
            col("n"))))
      .select(col(seriesCol), col("n"), col("slope_micro"),
        col("intercept_micro"))
  }

  /** Theil–Sen robust trend: the exact LOWER MEDIAN of all pairwise
    * slopes (y₂−y₁)·1000 div (x₂−x₁) over x₁ &lt; x₂ — the estimator a
    * single corrupted period cannot drag (breakdown point ≈ 29%,
    * Sen 1968), where OLS follows any outlier.
    *
    * Scale shape: pairs come from a per-series SELF-EQUI-JOIN on the
    * period rollup — O(d²) in the PERIOD-DOMAIN size d (days in range),
    * never the event volume, the same domain-not-corpus contract as
    * [[cusum]]. The median picks row ⌈m/2⌉ of the per-series slope
    * ordering (window over m = O(d²) rollup-pair rows).
    * Output: (series, n_pairs, slope_milli).
    */
  def theilSenSlope(
      perPeriod: DataFrame, seriesCol: String, xCol: String,
      yCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val a = perPeriod.select(col(seriesCol).as("__s"),
      col(xCol).cast("long").as("__x1"), col(yCol).cast("long").as("__y1"))
    val b = perPeriod.select(col(seriesCol).as("__s"),
      col(xCol).cast("long").as("__x2"), col(yCol).cast("long").as("__y2"))
    val slopes = a.join(b, Seq("__s"))
      .where(col("__x1") < col("__x2"))
      .select(col("__s"),
        div((col("__y2") - col("__y1")) * 1000L, col("__x2") - col("__x1"))
          .as("__slope"))
    val w = Window.partitionBy(col("__s")).orderBy(col("__slope"))
    val wAll = Window.partitionBy(col("__s"))
    slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(wAll))
      .where(col("__rn") === div(col("__m") + 1L, lit(2L)))
      .select(col("__s").as(seriesCol), col("__m").as("n_pairs"),
        col("__slope").as("slope_milli"))
  }

  /** First-order Markov transition matrix over an ordered event stream:
    * per key, each event hands off to its successor (lead over a TOTAL
    * per-key order — ties broken by `tieCol`, so every engine sees the
    * same successor), then one map-side-combined count per
    * (from, to) pair; row-normalized probability in ppm via the
    * per-from-state total as a ride-along window aggregate over the
    * STATE-DOMAIN-sized count table (|states|² rows, never the corpus).
    * Output: (from_state, to_state, n, p_ppm).
    */
  def transitionMatrix(
      df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      stateCol: String): DataFrame = {
    val div = graft.functions.GraftColumns.longDiv _
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_state"))
    pairs
      .withColumn("p_ppm", div(col("n") * 1000000L,
        sum(col("n")).over(wFrom)))
      .select(col("from_state"), col("to_state"), col("n"), col("p_ppm"))
  }

  /** Power iteration toward the chain's stationary distribution over a
    * `transitionMatrix` output: x₀ uniform ⌊1e6/|states|⌋ ppm, then
    * x_{t+1}(s′) = Σ_s ⌊x_t(s)·p_ppm(s,s′) / 1e6⌋ for a FIXED round
    * count — the q106 PageRank discipline (fixed rounds + per-term
    * integer floors ⇒ any engine replays every round bit-for-bit; a
    * convergence test would hash-diverge on the edge iteration).
    *
    * Each round is one equi-join of the |states|²-bounded edge table
    * against the |states|-row mass vector plus a groupBy — the domain
    * is STATE-sized, corpus-free, so rounds cost nothing at any data
    * scale (the corpus was spent building the transition counts).
    * States with no outgoing edges leak mass, and the per-term floors
    * shave ppm crumbs — totals are a readout, not an invariant
    * (document beats renormalizing: renormalization would divide by a
    * drifting total and break exact replay).
    *
    * Output: (round 1..rounds, state, mass_ppm) — the trajectory, so
    * callers can see mixing, not just the endpoint.
    */
  def stationaryDistribution(
      trans: DataFrame, fromCol: String, toCol: String,
      pPpmCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "fixed small round count")
    import graft.ops.Checkpointer._
    val div = graft.functions.GraftColumns.longDiv _
    // checkpoint the |states|²-bounded edge table and the state list
    // ONCE before the loop: every round (and every branch of the
    // unioned trajectory) re-reads them, and without the truncation
    // the corpus-scale upstream that BUILT the transition counts
    // (q272: a lead-window rollup over events) would re-execute
    // O(rounds²) times.
    val edges = trans.select(col(fromCol), col(toCol), col(pPpmCol))
      .graftCheckpoint()
    val states = edges.select(col(fromCol).as("state"))
      .union(edges.select(col(toCol).as("state"))).distinct()
      .graftCheckpoint()
    val k = states.agg(count(lit(1)).as("__k"))
    var x = states.crossJoin(broadcast(k))
      .select(col("state"), div(lit(1000000L), col("__k")).as("mass_ppm"))
    (1 to rounds).map { r =>
      val nxt = edges
        .join(x.withColumnRenamed("state", "__from"),
          col(fromCol) === col("__from"))
        .select(col(toCol).as("state"),
          div(col("mass_ppm") * col(pPpmCol), lit(1000000L)).as("__m"))
        .groupBy(col("state")).agg(sum(col("__m")).as("__nm"))
      x = states.join(nxt, Seq("state"), "left")
        .select(col("state"),
          coalesce(col("__nm"), lit(0L)).as("mass_ppm"))
      x.select(lit(r.toLong).as("round"), col("state"), col("mass_ppm"))
    }.reduce(_ unionByName _)
  }
}
