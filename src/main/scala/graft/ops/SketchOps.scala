package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch structures built from portable integer hashing.
  *
  * Unlike the built-in HLL++/KLL aggregates (used via
  * `approx_count_distinct`/`percentile_approx`, spec-only because their
  * internals are engine-specific), a count-min sketch is DETERMINISTIC
  * given its hash functions — with the repo's portable polynomial hash
  * it is reproducible across engines and therefore gate-checkable
  * (q111), while keeping the sketch property that matters at 100 TB:
  * the structure is a fixed d×w integer grid, mergeable by cell-wise
  * addition, no matter how many tokens stream through it.
  */
object SketchOps {

  /** Row-r bucket of a term: portable hash of (term:salt:r) mod w. */
  private def bucket(
      term: Column, r: Column, w: Int, salt: String): Column =
    pmod(TextOps.polyHash(
      concat(term, lit(s":$salt:"), r.cast("string"))), lit(w.toLong))

  /** Build a d×w count-min sketch over a term column: one exploded
    * pass (d copies per term occurrence), one map-side-combined
    * aggregate → (r, bucket, cnt) cells. Merge two sketches by
    * unioning and re-summing cells (algebraic — same contract as
    * mergeRollup).
    */
  def countMinSketch(
      terms: DataFrame, termCol: String,
      d: Int, w: Int, salt: String): DataFrame = {
    require(d > 0 && w > 0, "sketch dims must be positive")
    terms
      .select(col(termCol).as("__t"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), bucket(col("__t"), col("r"), w, salt).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate term frequencies from a sketch: est(t) = min over
    * rows of cell(r, h_r(t)) — an upper bound on the true count (never
    * under-counts; over-counts only on bucket collisions). Probe terms
    * fan out to d cells each and equi-join the sketch — the sketch
    * itself is d×w rows, broadcastable at any corpus size.
    */
  def countMinEstimate(
      sketch: DataFrame, probes: DataFrame, termCol: String,
      d: Int, w: Int, salt: String): DataFrame =
    probes
      .select(col(termCol), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucket(col(termCol), col("r"), w, salt))
      .join(broadcast(sketch), Seq("r", "bucket"), "left_outer")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
