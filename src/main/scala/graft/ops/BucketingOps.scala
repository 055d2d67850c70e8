package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) storage for co-located joins and
  * shuffle-free aggregation — the storage-level answer to "this join's
  * shuffle becomes the bottleneck at 100 TB".
  *
  * A fact table bucketed AND sorted by its join key joins a
  * same-bucketed dimension (or another fact) with NO Exchange and NO
  * Sort on either side: each task zips bucket i with bucket i
  * (spec-checked in BucketingSpec by asserting the physical plan has no
  * ShuffleExchange). Likewise `groupBy(bucketKey)` skips its shuffle.
  * The reference leans on PostgreSQL btree indexes for the same access
  * pattern (postgres_init.sql:42,55); bucketing is the distributed
  * columnar equivalent.
  *
  * At 100 TB: bucket count is a layout-time decision — pick
  * `totalBytes / bucketCount` ≈ a comfortable task input (128-512 MB);
  * re-bucketing costs ONE shuffle once, then every downstream join/agg
  * on that key is shuffle-free forever. Repeated-join keys (fact-to-fact
  * on order key, doc-id joins in dedup pipelines) amortize fastest.
  */
object BucketingOps {

  /** Write `df` as a bucketed+sorted managed table. The repartition on
    * the bucket key aligns write tasks with buckets (HashPartitioning
    * and bucketing share the same Murmur3 hash), so each bucket is ONE
    * file: without it every writer emits a file per bucket (writers ×
    * buckets small files), and a multi-file bucket loses its sorted
    * guarantee — Spark would re-Sort before a merge join.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sorted: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    // A rebuild must survive a stale location: with a non-persistent
    // catalog (fresh session, old warehouse dir) Overwrite alone fails
    // with LOCATION_ALREADY_EXISTS.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
    val aligned = df.repartition(nBuckets, bucketCols.map(col): _*)
    val w = aligned.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** APPEND `df` into an existing bucketed table, preserving the bucket
    * layout: rows are repartitioned by the same Murmur3 hash before the
    * write, so each append adds one correctly-hashed file per touched
    * bucket and downstream joins/aggs on the bucket key stay
    * exchange-free. This is the index-REFRESH primitive: maintaining a
    * stored index costs one |delta| pass, not a corpus rebuild.
    *
    * Note the sorted-scan caveat: a multi-file bucket loses the
    * sorted-within-bucket guarantee, so plans over an appended table may
    * re-Sort before a merge join — but never re-Exchange, which is the
    * cost that scales with the corpus. Compact back to one file per
    * bucket (a [[writeBucketed]] rebuild) on whatever cadence the sort
    * matters.
    */
  def appendBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sorted: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val aligned = df.repartition(nBuckets, bucketCols.map(col): _*)
    val w = aligned.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .saveAsTable(table)
    // Readers resolve V1 tables through a per-session cached plan whose
    // file listing predates this append; invalidate so the next
    // spark.table(table) on THIS session sees the new files. NB each
    // session caches independently — a reader on another session (e.g.
    // the outer session while this append ran inside foreachBatch's
    // clone) must refreshTable itself or re-resolve in a fresh session.
    df.sparkSession.catalog.refreshTable(table)
  }

  /** Equi-join of two same-bucketed tables on the bucket key. With both
    * sides bucketed `nBuckets` on `keys`, the plan is a SortMergeJoin
    * (or shuffled hash join) whose children are bare scans — no
    * Exchange; with `sorted=true` writes, no Sort either.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
