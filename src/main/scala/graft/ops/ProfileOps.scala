package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality entry point of a curation
  * pipeline: per-column row/null/distinct counts, min/max, and the
  * top-k most frequent values, as one long-format stats table.
  *
  * Scale design (the reason this is an operator and not a notebook
  * loop): a per-column driver loop costs one scan per column — at
  * 100 TB × 40 columns that is 40 corpus reads. Here ALL columns
  * profile in ONE pass: each row explodes to (column, value-string)
  * pairs — c small structs per row, map-side combined immediately —
  * and every downstream aggregate is keyed by (column) or
  * (column, value), so the shuffled stream is the distinct-value
  * stream, never the corpus. Top-k uses the two-level window build
  * (quantileSketchGrouped's shape) so no task ever sorts a hot
  * column's full distinct set.
  *
  * Values are profiled as canonical strings (Spark's cast-to-string);
  * keep gate columns to types whose rendering is engine-portable
  * (integers, strings, dates) — float rendering differs across
  * engines.
  */
object ProfileOps {

  /** Profile `cols` of `df` in one pass. Output, one row per column:
    * (column, n_rows, n_nulls, n_distinct, min_val, max_val, top3) —
    * top3 = "value:count|value:count|..." by descending count, ties by
    * value, nulls excluded from distinct/min/max/top.
    */
  def profile(
      df: DataFrame, cols: Seq[String], topK: Int = 3,
      fanout: Int = 32): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("val"))): _*))
      .as("p"))
      .select(col("p.column").as("column"), col("p.val").as("val"))
    val base = pairs.groupBy(col("column")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_nulls"),
      min(col("val")).as("min_val"),
      max(col("val")).as("max_val"))
    // distinct-value stream: the only shuffle keyed finer than column
    val counts = pairs.filter(col("val").isNotNull)
      .groupBy(col("column"), col("val"))
      .agg(count(lit(1)).as("cnt"))
    val nd = counts.groupBy(col("column"))
      .agg(count(lit(1)).as("n_distinct"))
    // two-level top-k: pass 1 ranks within (column, hash(val) mod
    // fanout) so no task sorts a hot column's full distinct set; the ≤
    // fanout·topK survivors then rank per column. Sub-bucket top-k ⊇
    // global top-k, so the two levels are exact.
    val ord = Seq(col("cnt").desc, col("val").asc)
    def rank(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      row_number().over(w)
    val top = counts
      .withColumn("__rk", rank(Window
        .partitionBy(col("column"), pmod(xxhash64(col("val")), lit(fanout)))
        .orderBy(ord: _*)))
      .filter(col("__rk") <= topK).drop("__rk")
      .withColumn("__rk", rank(Window
        .partitionBy(col("column")).orderBy(ord: _*)))
      .filter(col("__rk") <= topK)
      .groupBy(col("column"))
      .agg(concat_ws("|", transform(
        array_sort(collect_list(struct(col("__rk"),
          concat_ws(":", col("val"), col("cnt")).as("s")))),
        e => e.getField("s"))).as("top3"))
    base.join(nd, Seq("column"), "left_outer")
      .join(top, Seq("column"), "left_outer")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"),
        coalesce(col("top3"), lit("")).as("top3"))
      .orderBy(col("column"))
  }
}
