package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning primitive of an
  * incremental training-data pipeline: given two snapshots of a keyed
  * corpus, classify every key as added / removed / changed / unchanged,
  * so downstream stages (re-tokenization, re-embedding, index refresh)
  * touch only the delta.
  *
  * 100 TB shape: both sides are first projected to (key, content-hash) —
  * a 128-bit md5 over the compare columns — so the full-outer shuffle
  * moves ~48 bytes/row instead of document bodies. One shuffle join on
  * the key, no driver collects, no skew hazard (keys are unique per
  * snapshot by contract).
  */
object SnapshotOps {

  /** 128-bit content hash over the compare columns, null-safe: columns
    * are cast to string with a \\u0000 sentinel for NULL and joined on
    * \\u0001 (neither occurs in data columns by contract), so
    * (NULL, "a") != ("a", NULL) and NULL != "".
    */
  def contentHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Classify every key across two snapshots. Output: keyCols + status ∈
    * {'added','removed','changed','unchanged'} (added = only in new,
    * removed = only in old, changed = present in both with differing
    * compare-column content).
    */
  def diffStatus(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    require(!keyCols.exists(Set("status", "__h_old", "__h_new")),
      "key columns collide with diffStatus output/internal names")
    def slim(df: DataFrame, tag: String): DataFrame =
      df.select(keyCols.map(col) :+
        contentHash(compareCols.map(col)).as(s"__h_$tag"): _*)
    slim(oldSnap, "old")
      .join(slim(newSnap, "new"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"): _*)
  }
}
