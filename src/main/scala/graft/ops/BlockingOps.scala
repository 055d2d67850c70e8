package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-pair generation for entity resolution / record linkage.
  *
  * The repo's other pair generators reach candidates through key
  * equality (LSH buckets, posting lists, IVF cells). Blocking covers
  * the remaining classic: candidates defined by PROXIMITY IN A SORT
  * ORDER — near-identical names, adjacent timestamps, close numeric
  * keys — where a similarity key doesn't hash but does sort.
  */
object BlockingOps {

  /** Sorted-neighborhood blocking (Hernández & Stolfo, Data Mining and
    * Knowledge Discovery 2(1), 1998): candidate pairs are exactly the
    * row pairs within `window` positions of each other under the total
    * order `orderCols` — O(n·window) candidates instead of the
    * O(n²) all-pairs join (q88's conformance shape), at the cost of
    * missing matches that sort far apart (run several passes with
    * different sort keys for recall, as the paper prescribes).
    *
    * Scale shape: the ranking is [[IdOps.contiguousIds]]
    * (range-partitioned sort + zipWithIndex — multi-reducer, no
    * one-task window). The "within window" condition never becomes an
    * inequality join: with block = idx div window, any pair within
    * `window` positions spans at most ADJACENT blocks, so each a-side
    * row probes its own block and the next via an exploded 2-row key
    * and the join is a plain equi-join on the block id; the exact
    * rank-distance filter runs on its output (≤ 2·window·n rows).
    *
    * `orderCols` must be a total order (unique key or explicit
    * tiebreak) — ties would make ranks, and therefore the candidate
    * set, nondeterministic. Output: every input column twice with
    * `_a`/`_b` suffixes, the a-side strictly lower-ranked.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame, window: Int, orderCols: String*): DataFrame = {
    require(window > 0, "window must be positive")
    require(orderCols.nonEmpty, "sortedNeighborhoodPairs needs a total order")
    require(!df.columns.exists(_.startsWith("__")),
      "reserved __ column prefix in input")
    val div = graft.functions.GraftColumns.longDiv _
    val withIdx = IdOps.contiguousIds(df, "__idx", orderCols: _*)
      .withColumn("__blk", div(col("__idx"), lit(window.toLong)))
    val a = withIdx.select(
      df.columns.toIndexedSeq.map(c => col(c).as(s"${c}_a")) :+
        col("__idx").as("__idx_a") :+
        explode(array(col("__blk"), col("__blk") + 1L)).as("__jblk"): _*)
    val b = withIdx.select(
      df.columns.toIndexedSeq.map(c => col(c).as(s"${c}_b")) :+
        col("__idx").as("__idx_b") :+ col("__blk").as("__jblk"): _*)
    a.join(b, Seq("__jblk"))
      .filter(col("__idx_b") > col("__idx_a") &&
        col("__idx_b") - col("__idx_a") <= window)
      .drop("__jblk", "__idx_a", "__idx_b")
  }

  /** MULTI-PASS sorted-neighborhood blocking (the full Hernández–Stolfo
    * method): one [[sortedNeighborhoodPairs]] pass per sort-key list,
    * results unioned and de-duplicated. A single sort key misses true
    * pairs whose difference lands early in the key (a typo in the
    * first character moves a record far away in the sort); passes over
    * complementary keys (name, reversed name, phonetic key, zip+street)
    * each catch what the others scatter. Cost is additive in passes —
    * each pass is the same O(n·w) rank + adjacent-block equi-join —
    * and the union/distinct dedups cross-pass repeats of the same
    * unordered pair (pairs are canonicalized on the given `idCol` so
    * the two orientations a pair can take in different sort orders
    * collapse).
    */
  def sortedNeighborhoodPairsMultiPass(
      df: DataFrame, window: Int, idCol: String,
      passes: Seq[Seq[String]]): DataFrame = {
    require(passes.nonEmpty, "need at least one pass")
    val perPass = passes.map { ord =>
      val p = sortedNeighborhoodPairs(df, window, ord: _*)
      // canonical orientation: the lower id is always the _a side
      val flip = col(s"${idCol}_b") < col(s"${idCol}_a")
      p.select(df.columns.toIndexedSeq.flatMap(c => Seq(
        when(flip, col(s"${c}_b")).otherwise(col(s"${c}_a")).as(s"${c}_a"),
        when(flip, col(s"${c}_a")).otherwise(col(s"${c}_b")).as(s"${c}_b")
      )): _*)
    }
    perPass.reduce(_.unionByName(_)).distinct()
  }
}
