package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Default [[DocSink]]: idempotent upsert-by-id over bucketed parquet —
  * replaces the ES bulk upsert (postgres_to_es/daemon.py:358-381):
  * re-writing a doc with the same id replaces it, so replaying any
  * batch suffix is a no-op (T2's effectively-once contract).
  *
  * Layout: parquet partitioned by `bucket = pmod(hash(id), nBuckets)`.
  * An upsert rewrites only the buckets that contain incoming ids
  * (dynamic partition overwrite): merge = union(new, old ∖ new-ids)
  * within those buckets. At 100 TB the rewrite cost per tick is
  * O(affected buckets), not O(store); raise nBuckets with corpus size.
  *
  * `retry`: exponential-backoff policy for the DRIVER-side sink actions
  * (the whole upsert/delete including its file ops) — the engine-side
  * parity of the reference wrapping every ES bulk call in its backoff
  * decorator (postgres_to_es/utils.py:19-53). Whole-action replay is
  * safe precisely because the sink contract is idempotent upsert-by-id;
  * Spark's own task retries cover executor-side faults mid-job, this
  * covers the failures Spark does not retry. Fault-injection-tested in
  * CdcSpec.
  */
final class UpsertSink(
    spark: SparkSession, dir: String, val idCol: String,
    nBuckets: Int = 64,
    retry: Option[graft.sources.JdbcIO.RetryPolicy] = None)
    extends DocSink {

  private def withSinkRetry[T](f: => T): T =
    retry.fold(f)(p => graft.sources.JdbcIO.withRetry(p)(f))

  private def bucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(nBuckets))

  private def storeExists: Boolean =
    new java.io.File(dir).exists()

  def read(): Option[DataFrame] =
    if (storeExists) Some(spark.read.parquet(dir).drop("bucket")) else None

  /** Targeted delete by id (the right-to-be-forgotten path for a
    * training-data store): like [[upsert]], only buckets containing a
    * requested id rewrite — O(affected buckets), not O(store). Ids not
    * present are ignored. Idempotent: replaying a delete is a no-op.
    */
  def delete(ids: DataFrame): Unit = withSinkRetry {
    if (storeExists) deleteExisting(ids)
  }

  private def deleteExisting(ids: DataFrame): Unit = {
    val victims = ids.select(col(idCol)).distinct()
      .withColumn("bucket", bucket(col(idCol)))
    val affected = victims.select("bucket").distinct()
      .collect().map(_.getAs[Number](0).intValue()).sorted
    if (affected.isEmpty) return
    val existing = spark.read.parquet(dir)
      .filter(col("bucket").isin(affected.toIndexedSeq.map(Integer.valueOf): _*))
    val keep = existing.join(
      victims.select(col(idCol)), Seq(idCol), "left_anti")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // dynamic overwrite only replaces partitions PRESENT in the
      // output — a bucket emptied by the delete has no rows in `keep`,
      // so its stale files must be dropped explicitly below.
      val kept = keep.localCheckpoint(eager = true)
      val keptBuckets = kept.select("bucket").distinct()
        .collect().map(_.getAs[Number](0).intValue()).toSet
      kept.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.filterNot(keptBuckets).foreach { b =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/bucket=$b")
        if (fs.exists(p)) { fs.delete(p, true); () }
      }
      // A delete that empties the LAST bucket leaves a directory with no
      // parquet underneath — spark.read.parquet would throw on it, and
      // `storeExists` would still claim a store. Collapse to the clean
      // invariant empty store == no store: read() → None, next upsert
      // bootstraps fresh.
      val root = new org.apache.hadoop.fs.Path(dir)
      val anyBucketLeft = fs.exists(root) && fs.listStatus(root)
        .exists(_.getPath.getName.startsWith("bucket="))
      if (!anyBucketLeft) { fs.delete(root, true); () }
    } finally {
      prev.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
    }
  }

  /** Upsert `docs` (unique by idCol — enforce upstream) into the store. */
  def upsert(docs: DataFrame): Unit = withSinkRetry {
    require(!docs.columns.contains("bucket"),
      "'bucket' is a reserved sink column — the store partitions on it")
    val incoming = docs.withColumn("bucket", bucket(col(idCol)))
    if (!storeExists)
      incoming.write.partitionBy("bucket").parquet(dir)
    else
      upsertExisting(incoming)
  }

  private def upsertExisting(incoming: DataFrame): Unit = {
    val affected = incoming.select("bucket").distinct()
      .collect().map(_.getAs[Number](0).intValue()).sorted
    if (affected.isEmpty) return
    val existing = spark.read.parquet(dir)
      .filter(col("bucket").isin(affected.toIndexedSeq.map(Integer.valueOf): _*))
    val keep = existing.join(
      incoming.select(col(idCol)), Seq(idCol), "left_anti")
    val merged = keep.unionByName(incoming)
    // dynamic overwrite: only the affected bucket partitions rewrite
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // localCheckpoint breaks the self-read lineage so the overwrite
      // doesn't read the files it is replacing mid-write.
      merged.localCheckpoint(eager = true)
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
    }
  }
}
