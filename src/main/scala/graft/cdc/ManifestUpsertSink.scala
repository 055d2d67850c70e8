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
  *   dir/MANIFEST-<v>                  bucket -> commit pointer table,
  *                                     one immutable file per version;
  *                                     the HIGHEST <v> is current
  *   dir/data/commit-<n>/bucket=<b>/   immutable parquet, one dir per commit
  *   dir/.stage/                       scratch for the incoming batch
  *
  * Each upsert/delete first STAGES the incoming batch to parquet and
  * reads it back, so the user's plan is executed exactly once — a
  * nondeterministic input (sampling, shuffle-order-dependent values)
  * cannot make the written buckets diverge from the manifest entries.
  * The merged content of the affected buckets then goes to a FRESH
  * `commit-<n>` directory, and the new manifest is published by
  * renaming a temp file to the FRESH name `MANIFEST-<v+1>` — never
  * deleting or clobbering the live manifest, so the swap is safe even
  * on filesystems whose rename refuses to replace an existing
  * destination (HDFS): a crash at ANY point leaves either the old
  * highest-versioned manifest (old snapshot bit-for-bit intact, the
  * orphaned commit dir gc'd by the next successful commit) or the new
  * one (commit complete). This is the snapshot-isolation idea of the
  * table formats (Iceberg/Delta), reduced to the essentials a doc
  * store needs.
  *
  * `retainSnapshots` (>= 1) keeps the bucket dirs referenced by the
  * last N manifest versions alive, so a reader that planned against
  * version v can still execute while up to N-1 later commits land —
  * a real snapshot-isolation window instead of "materialize before
  * the next tick". N = 1 gc's to exactly the live set.
  *
  * Scale shape: identical to [[UpsertSink]] — per tick, stage is
  * O(|batch|) and read + rewrite is O(affected buckets) not O(store);
  * commit is one rename. read() plans reference the commit dirs
  * current at call time and stay valid for the next
  * `retainSnapshots - 1` commits (single writer).
  *
  * `beforeCommit`: test seam — runs after the data write, before the
  * manifest swap (the crash window the design closes).
  */
final class ManifestUpsertSink(
    spark: SparkSession, dir: String, val idCol: String,
    nBuckets: Int = 64,
    retainSnapshots: Int = 2,
    retry: Option[graft.sources.JdbcIO.RetryPolicy] = None,
    beforeCommit: () => Unit = () => (),
    lease: Option[WriterLease] = None)
    extends DocSink {

  require(retainSnapshots >= 1, "retainSnapshots must be >= 1")

  private def withSinkRetry[T](f: => T): T =
    retry.fold(f)(p => graft.sources.JdbcIO.withRetry(p)(f))

  private def bucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(nBuckets))

  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath = new Path(dir, "data")
  private def stagePath = new Path(dir, ".stage")

  /** Manifest versions present on disk, ascending (pure listing —
    * readers must never mutate the store; see [[loadManifest]] for the
    * legacy-layout story).
    */
  private def manifestVersions(): Seq[Long] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName).collect {
      case n if n.startsWith("MANIFEST-") =>
        n.stripPrefix("MANIFEST-").toLong
    }.sorted.toSeq
  }

  private def manifestPath(v: Long) = new Path(dir, s"MANIFEST-$v")
  private def legacyManifestPath = new Path(dir, "MANIFEST")

  private def readManifestFile(v: Long): Map[Int, String] =
    readManifestAt(manifestPath(v))

  private def readManifestAt(p: Path): Map[Int, String] = {
    val in = fs.open(p)
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

  /** Current (highest-versioned) manifest; empty map == absent store.
    * A store written by the pre-versioning layout (a single `MANIFEST`
    * file) is read IN PLACE — never silently treated as absent, which
    * would let the next commit's gc destroy its only references; the
    * rename to `MANIFEST-0` happens on the WRITE path only, so pure
    * readers (read-only mounts, concurrent readers) never mutate.
    */
  private def loadManifest(): Map[Int, String] =
    manifestVersions().lastOption.map(readManifestFile).getOrElse {
      if (fs.exists(legacyManifestPath)) readManifestAt(legacyManifestPath)
      else Map.empty
    }

  /** Test/introspection seam: the live bucket -> commit table. */
  private[graft] def currentManifest(): Map[Int, String] = loadManifest()

  // ---- writer-side split-brain tripwire (the PostingIndex
  // requireCurrent contract, VERDICT r11 #5): remember the manifest
  // version as of this handle's construction / last own publish; a
  // mutating op on a handle whose store was advanced by ANOTHER
  // writer would publish a manifest built from a superseded snapshot,
  // silently orphaning the newer writer's commits at the next gc —
  // refuse loudly instead. Reads never check (retained snapshots
  // cover lagging readers); re-opening the sink snapshots the
  // current version.
  private var expectedVersion: Long =
    manifestVersions().lastOption.getOrElse(-1L)

  private def requireCurrent(): Unit = {
    // preventive layer first (VERDICT r13 #5, when a lease is wired):
    // a superseded writer aborts on the advisory lease BEFORE paying
    // any op work; the version check below stays the detective
    // backstop for the acquire window the lease cannot close
    lease.foreach(_.requireHeld())
    val now = manifestVersions().lastOption.getOrElse(-1L)
    // trip ONLY on an ADVANCE (a publish this handle never saw — a
    // newer writer). A REGRESSION is a legacy-layout migration or a
    // simulated crash (versions never move backwards under the
    // single-writer contract) — proceed, never trip.
    require(now <= expectedVersion,
      s"stale sink handle at $dir: manifest is at version $now but " +
        s"this handle last saw $expectedVersion — a newer writer " +
        "advanced the store (single-writer contract); re-open the " +
        "sink to resume")
  }

  /** Publish `m` as the next manifest version: temp write + rename to a
    * FRESH name (never clobbers the live manifest — atomic-enough on
    * every FS whose rename is atomic for a non-existing destination),
    * then prune versions beyond the retention window. A crash anywhere
    * leaves a readable highest-versioned manifest.
    */
  private def writeManifest(m: Map[Int, String]): Unit = {
    val next = manifestVersions().lastOption.fold(0L)(_ + 1L)
    val tmp = new Path(dir, ".MANIFEST.tmp")
    val body = ("v1" +: m.toSeq.sorted.map { case (b, c) => s"$b\t$c" })
      .mkString("", "\n", "\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, manifestPath(next)),
      s"manifest publish failed at $dir")
    // the handle's split-brain token advances WITH the publish (not at
    // op end) so a post-publish failure retried by this same handle —
    // withSinkRetry's legitimate idempotent replay — never self-trips
    expectedVersion = next
    // writer-side legacy migration: the published versions subsume the
    // pre-versioning MANIFEST's content (loadManifest read it), but the
    // legacy snapshot gets the SAME retention window as a versioned one
    // — it retires only once `retainSnapshots` versioned manifests
    // exist (until then gc() keeps counting its bucket references as
    // live, so a concurrent legacy reader is protected exactly like a
    // reader on any retained snapshot). Never touched on a read path.
    if (manifestVersions().size >= retainSnapshots &&
        fs.exists(legacyManifestPath))
      { fs.delete(legacyManifestPath, false); () }
    manifestVersions().dropRight(retainSnapshots)
      .foreach(v => fs.delete(manifestPath(v), false))
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
    * publish: a `bucket=b` subdir inside commit `c` is live iff ANY
    * retained manifest version maps b -> c, so partially-superseded
    * commits shed bucket copies as they age out of the retention
    * window (storage stays bounded by `retainSnapshots` snapshots —
    * without this, a long-running CDC daemon touching a few buckets
    * per tick would accumulate stale copies unboundedly, because old
    * commit dirs rarely become FULLY unreferenced). Crash-orphaned
    * commits (referenced by no retained manifest) go the same way.
    */
  private def gc(): Unit = {
    // a still-present legacy MANIFEST counts as a retained snapshot
    // (writeManifest retires it only once `retainSnapshots` versioned
    // manifests exist), so its readers keep the same window
    val legacy: Set[(Int, String)] =
      if (fs.exists(legacyManifestPath))
        readManifestAt(legacyManifestPath).toSet
      else Set.empty
    val live: Set[(Int, String)] = legacy ++ manifestVersions()
      .takeRight(retainSnapshots)
      .flatMap(v => readManifestFile(v).toSeq)
    if (fs.exists(dataPath)) {
      fs.listStatus(dataPath).map(_.getPath).foreach { cp =>
        val commit = cp.getName
        if (commit.startsWith("commit-")) {
          var liveLeft = false
          fs.listStatus(cp).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith("bucket=")) {
              if (live((n.stripPrefix("bucket=").toInt, commit)))
                liveLeft = true
              else { fs.delete(st.getPath, true); () }
            } // non-bucket entries (_SUCCESS) are harmless markers
          }
          if (!liveLeft) { fs.delete(cp, true); () }
        }
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

  /** Stage `df` (already carrying a `bucket` column) to parquet and
    * hand back (read-back plan, bucket list from the written layout) —
    * None when the batch was EMPTY (an empty partitioned write leaves
    * only `_SUCCESS`, which has no readable schema; empty batches are
    * routine — CdcPipeline ticks can consume rows yet emit zero docs).
    * The input plan runs exactly ONCE; everything downstream — the
    * affected-bucket set, the merge, the commit — reads the frozen
    * staged copy, so a nondeterministic input cannot make the manifest
    * diverge from the written data. Also replaces the old driver
    * `.collect()` of distinct buckets with a directory listing.
    */
  private def stage(df: DataFrame): Option[(DataFrame, Seq[Int])] = {
    fs.delete(stagePath, true)
    df.write.partitionBy("bucket").parquet(stagePath.toString)
    val buckets = fs.listStatus(stagePath).map(_.getPath.getName).collect {
      case n if n.startsWith("bucket=") => n.stripPrefix("bucket=").toInt
    }.sorted.toSeq
    if (buckets.isEmpty) { fs.delete(stagePath, true); None }
    else Some((spark.read.parquet(stagePath.toString), buckets))
  }

  /** Upsert `docs` (unique by idCol — enforce upstream; empty batch ==
    * no-op).
    */
  def upsert(docs: DataFrame): Unit = withSinkRetry {
    require(!docs.columns.contains("bucket"),
      "'bucket' is a reserved sink column — the store partitions on it")
    requireCurrent()
    stage(docs.withColumn("bucket", bucket(col(idCol)))).foreach {
      case (staged, affected) =>
        val m = loadManifest()
        val merged = readBuckets(m, affected).fold(staged) { old =>
          old.join(staged.select(col(idCol)), Seq(idCol), "left_anti")
            .unionByName(staged)
        }
        val commit = nextCommit()
        merged.write.partitionBy("bucket")
          .parquet(new Path(dataPath, commit).toString)
        beforeCommit()
        writeManifest(m ++ affected.map(_ -> commit))
        gc()
        fs.delete(stagePath, true); ()
    }
  }

  /** Targeted delete by id — absent ids ignored, idempotent; empty id
    * set == no-op. A delete that empties the store publishes an EMPTY
    * manifest (empty manifest == absent store: read() → None, next
    * upsert bootstraps).
    */
  def delete(ids: DataFrame): Unit = withSinkRetry {
    requireCurrent()
    val m = loadManifest()
    if (m.nonEmpty) stage(
      ids.select(col(idCol)).distinct()
        .withColumn("bucket", bucket(col(idCol)))).foreach {
      case (stagedVictims, victimBuckets) =>
      val affected = victimBuckets.filter(m.contains)
      if (affected.nonEmpty) {
        val kept = readBuckets(m, affected).get
          .join(stagedVictims.select(col(idCol)), Seq(idCol), "left_anti")
        val commit = nextCommit()
        val commitDir = new Path(dataPath, commit)
        kept.write.partitionBy("bucket").parquet(commitDir.toString)
        // which buckets survived? — read it off the written layout
        // instead of paying a second Spark job
        val keptBuckets = fs.listStatus(commitDir)
          .map(_.getPath.getName).collect {
            case n if n.startsWith("bucket=") => n.stripPrefix("bucket=").toInt
          }.toSet
        beforeCommit()
        writeManifest((m -- affected) ++
          affected.filter(keptBuckets).map(_ -> commit))
        gc()
      }
      fs.delete(stagePath, true); ()
    }
  }
}
