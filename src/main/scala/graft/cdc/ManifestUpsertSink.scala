package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crash-safe [[DocSink]]: the same idempotent upsert-by-id contract as
  * [[UpsertSink]] (reference semantics: postgres_to_es/daemon.py:358-381
  * — re-indexing a doc replaces it, replay is a no-op), but with
  * snapshot-commit storage instead of dynamic partition overwrite.
  *
  * Why: dynamic overwrite REPLACES a bucket's files in place — a driver
  * crash mid-rewrite can leave a bucket with old files deleted and new
  * ones unfinished, and CDC replay cannot restore the bucket's
  * untouched docs (they were never in the replayed batch). This sink
  * never mutates or deletes a live file inside a commit:
  *
  *   dir/MANIFEST                      bucket -> commit pointer table
  *   dir/data/commit-<n>/bucket=<b>/   immutable parquet, one dir per commit
  *
  * Each upsert/delete writes the merged content of its affected buckets
  * to a FRESH `commit-<n>` directory, then swaps MANIFEST via
  * temp-file + atomic rename (the [[Keyset.CursorStore]] pattern;
  * atomic on HDFS/local — an object store needs a conditional-put
  * variant). Crash before the swap: the old manifest still references
  * only old, untouched files — the store is bit-for-bit intact, and the
  * orphaned commit dir is garbage-collected by the next successful
  * commit. This is the snapshot-isolation idea of the table formats
  * (Iceberg/Delta), reduced to the essentials a doc store needs.
  *
  * Scale shape: identical to [[UpsertSink]] — per tick, read + rewrite
  * is O(affected buckets) not O(store), commit is one rename. read()
  * plans reference the specific commit dirs current at call time and
  * stay valid until a LATER commit touches those buckets (single
  * writer; materialize reads before the next tick commits).
  *
  * `beforeCommit`: test seam — runs after the data write, before the
  * manifest swap (the crash window the design closes).
  */
final class ManifestUpsertSink(
    spark: SparkSession, dir: String, val idCol: String,
    nBuckets: Int = 64,
    retry: Option[graft.sources.JdbcIO.RetryPolicy] = None,
    beforeCommit: () => Unit = () => ())
    extends DocSink {

  private def withSinkRetry[T](f: => T): T =
    retry.fold(f)(p => graft.sources.JdbcIO.withRetry(p)(f))

  private def bucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(nBuckets))

  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath = new Path(dir, "MANIFEST")
  private def dataPath = new Path(dir, "data")

  /** bucket -> commit name; empty map == absent store. */
  private def loadManifest(): Map[Int, String] =
    if (!fs.exists(manifestPath)) Map.empty
    else {
      val in = fs.open(manifestPath)
      val text =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      val header = if (lines.hasNext) lines.next() else ""
      require(header == "v1", s"unknown manifest version '$header' at $dir")
      lines.map { l =>
        val Array(b, c) = l.split("\t", 2)
        b.toInt -> c
      }.toMap
    }

  private def writeManifest(m: Map[Int, String]): Unit = {
    val tmp = new Path(dir, s".MANIFEST.tmp")
    val body = ("v1" +: m.toSeq.sorted.map { case (b, c) => s"$b\t$c" })
      .mkString("", "\n", "\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, manifestPath)) {
      // HDFS/local rename refuses to clobber an existing destination —
      // the swap is delete-then-rename, and a crash between the two
      // simply re-runs the whole idempotent sink action (retry policy /
      // CDC replay), which rebuilds tmp and completes the swap.
      fs.delete(manifestPath, false)
      require(fs.rename(tmp, manifestPath), s"manifest swap failed at $dir")
    }
  }

  /** Next commit name — scans existing dir names (not the manifest) so
    * orphans from a crashed attempt are never reused.
    */
  private def nextCommit(): String = {
    val used =
      if (!fs.exists(dataPath)) Array.empty[Long]
      else fs.listStatus(dataPath).map(_.getPath.getName).collect {
        case n if n.startsWith("commit-") => n.stripPrefix("commit-").toLong
      }
    s"commit-${if (used.isEmpty) 0L else used.max + 1L}"
  }

  /** Bucket-granular garbage collection, run only after a successful
    * swap: a `bucket=b` subdir inside commit `c` is live iff the
    * manifest maps b -> c, so partially-superseded commits shed their
    * stale bucket copies immediately (storage stays exactly the live
    * set — without this, a long-running CDC daemon touching a few
    * buckets per tick would accumulate stale copies unboundedly,
    * because old commit dirs rarely become FULLY unreferenced).
    * Crash-orphaned commits (referenced by nothing) go the same way.
    */
  private def gc(m: Map[Int, String]): Unit =
    if (fs.exists(dataPath)) {
      fs.listStatus(dataPath).map(_.getPath).foreach { cp =>
        val commit = cp.getName
        if (commit.startsWith("commit-")) {
          var liveLeft = false
          fs.listStatus(cp).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith("bucket=")) {
              if (m.get(n.stripPrefix("bucket=").toInt).contains(commit))
                liveLeft = true
              else { fs.delete(st.getPath, true); () }
            } // non-bucket entries (_SUCCESS) are harmless markers
          }
          if (!liveLeft) { fs.delete(cp, true); () }
        }
      }
    }

  /** Union of the manifest-referenced dirs, pruned to `buckets` —
    * partition discovery restores the `bucket` column, and the isin
    * filter prunes to the requested bucket partitions.
    */
  private def readBuckets(m: Map[Int, String], buckets: Seq[Int]): Option[DataFrame] = {
    val byCommit = buckets.filter(m.contains).groupBy(m)
    if (byCommit.isEmpty) None
    else Some(byCommit.toSeq.sortBy(_._1).map { case (commit, bs) =>
      spark.read.parquet(new Path(dataPath, commit).toString)
        .filter(col("bucket").isin(bs.map(Integer.valueOf): _*))
    }.reduce(_ unionByName _))
  }

  def read(): Option[DataFrame] = {
    val m = loadManifest()
    readBuckets(m, m.keys.toSeq).map(_.drop("bucket"))
  }

  /** Upsert `docs` (unique by idCol — enforce upstream). */
  def upsert(docs: DataFrame): Unit = withSinkRetry {
    val incoming = docs.withColumn("bucket", bucket(col(idCol)))
    val m = loadManifest()
    val affected = incoming.select("bucket").distinct()
      .collect().map(_.getAs[Number](0).intValue()).sorted.toSeq
    if (affected.nonEmpty) {
      val merged = readBuckets(m, affected).fold(incoming) { old =>
        old.join(incoming.select(col(idCol)), Seq(idCol), "left_anti")
          .unionByName(incoming)
      }
      val commit = nextCommit()
      merged.write.partitionBy("bucket")
        .parquet(new Path(dataPath, commit).toString)
      beforeCommit()
      val updated = m ++ affected.map(_ -> commit)
      writeManifest(updated)
      gc(updated)
    }
  }

  /** Targeted delete by id — absent ids ignored, idempotent. A delete
    * that empties the store removes MANIFEST entirely (empty store ==
    * no store: read() → None, next upsert bootstraps).
    */
  def delete(ids: DataFrame): Unit = withSinkRetry {
    val m = loadManifest()
    val affected =
      if (m.isEmpty) Seq.empty[Int]
      else {
        val victims = ids.select(col(idCol)).distinct()
          .withColumn("bucket", bucket(col(idCol)))
        victims.select("bucket").distinct()
          .collect().map(_.getAs[Number](0).intValue()).toSeq
          .filter(m.contains).sorted
      }
    if (affected.nonEmpty) {
      val victims = ids.select(col(idCol)).distinct()
      val kept = readBuckets(m, affected).get
        .join(victims, Seq(idCol), "left_anti")
      val commit = nextCommit()
      val commitDir = new Path(dataPath, commit)
      kept.write.partitionBy("bucket").parquet(commitDir.toString)
      // which buckets survived? — read it off the written layout instead
      // of paying a second Spark job
      val keptBuckets = fs.listStatus(commitDir)
        .map(_.getPath.getName).collect {
          case n if n.startsWith("bucket=") => n.stripPrefix("bucket=").toInt
        }.toSet
      beforeCommit()
      val updated = (m -- affected) ++
        affected.filter(keptBuckets).map(_ -> commit)
      if (updated.isEmpty) {
        fs.delete(manifestPath, false)
        gc(Map.empty)
      } else {
        writeManifest(updated)
        gc(updated)
      }
    }
  }
}
