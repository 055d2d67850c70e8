package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Maintenance sidecar (`<store>__maint.json`) for the set-tombstone
  * index families (LSH band-key table, IVF×PQ cell layout) — the
  * [[graft.movies.PostingIndex]] stats.json pattern ported to the
  * families whose only durable maintenance state used to be the
  * tombstone table itself. Two independent field groups share the one
  * file; every write preserves the fields it does not own:
  *
  *   - `nextSeq` — the O(1) op-seq counter (both families).
  *   - `scan` — the IVF×PQ SERVING-AUDIT statistics (VERDICT r13 #3):
  *     current stored rows per cell plus the build-time cell-fraction
  *     distribution, which together give the audited probe faces their
  *     actual probed-row fraction and the designed scan-fraction band
  *     with ZERO extra Spark jobs at serve time.
  *
  * Why the counter: every seq-allocating op (upsert/remove) and every
  * refresh high-water probe used to run a max-aggregate job over the
  * mergeSchema-read tombstone dir — O(|tombstone files|) per op, so a
  * K-op window between compactions paid O(K²) file opens in aggregate
  * (ADVICE r12 #2). The sidecar turns allocation into one tiny
  * deterministic JSON read.
  *
  * Protocol (single writer, like the families it serves):
  *   - `alloc` RESERVES: read next (sidecar, else one legacy derive
  *     from the tombstone table which then seeds the sidecar), write
  *     next+1 back, THEN the caller uses the seq. A torn op burns a
  *     seq — harmless, the counter stays monotone and a replay
  *     allocates fresh.
  *   - `highWater` (the refresh path) returns the last allocated seq,
  *     or the family's base seq when nothing was ever allocated. It
  *     normally only reads — but on a PRE-SIDECAR store it seeds the
  *     sidecar once from the legacy derive (see the method's scaladoc),
  *     so it is not strictly read-only.
  *   - compact clears the COUNTER together with the tombstone table
  *     ([[clearSeq]] — the scan stats survive, compact updates them
  *     separately); absent counter + absent tombstones ⇒ it restarts
  *     at 0, which the compact invariant (all rows reset to base seq)
  *     makes safe. An empty-collapsed store drops the whole sidecar
  *     with it ([[clear]]).
  *
  * The sidecar is authoritative once present. Restoring a STALE copy
  * of it (older than the tombstone table) could re-allocate a used
  * seq — that is store corruption of the same class as a torn
  * compact on these families: rebuild. DELETING it is safe: the next
  * alloc legacy-derives from the max seq across the tombstone table
  * AND the stored rows — the row side matters because a REFRESH can
  * land rows at a seq a torn op burned (reserved in the sidecar,
  * tombstones never written); a tombstone-only derive would re-issue
  * that seq and a later delete of the refreshed id would tie it and
  * lose (review-pass fix, round 13). A deleted sidecar also loses the
  * scan stats — the audited serves then return no audit (the honest
  * answer) until the next build/retrain records fresh ones.
  *
  * Durability of the sidecar itself: writes go through a tmp file +
  * rename, so the visible file is always a complete JSON document —
  * a crash mid-publish leaves the previous sidecar or none (none ⇒
  * the safe legacy derive). A present file that PARSES but carries
  * NEITHER field group is external corruption and trips a loud
  * require rather than silently restarting the counter at 0; a
  * parseable file missing only `nextSeq` is the legitimate
  * post-compact state (counter cleared, scan stats retained).
  */
private[graft] object SeqSidecar {

  private def sidecarPath(store: String): Path =
    new Path(store.stripSuffix("/") + "__maint.json")

  private type Node = JsonSidecar.Node

  /** The parsed sidecar root, if one exists. Only PARSE failures mean
    * corruption (a torn-write shape the tmp+rename publish should
    * never produce) — loud; transport errors (an fs blip) propagate as
    * themselves so an operator is never told to delete a healthy
    * sidecar over a transient fault. A parseable root carrying neither
    * known field group is equally loud (a foreign file squatting on
    * the sidecar name must not silently reset the counter).
    */
  private def readRoot(spark: SparkSession, store: String): Option[Node] =
    JsonSidecar.read(spark, sidecarPath(store)).map { parsed =>
      val root = parsed.orNull
      require(root != null &&
        (root.hasNonNull("nextSeq") || root.hasNonNull("scan")),
        s"corrupt seq sidecar at ${sidecarPath(store)}: no readable " +
          "nextSeq/scan field — delete it to fall back to the legacy " +
          "derive, or rebuild the store")
      root
    }

  private def publish(spark: SparkSession, store: String, root: Node): Unit =
    JsonSidecar.publish(spark, sidecarPath(store), root)

  private def newRoot: Node = JsonSidecar.newRoot

  /** The persisted next-seq, if the sidecar carries one. None for an
    * absent sidecar AND for a stats-only sidecar (the post-compact
    * state: [[clearSeq]] removed the counter, the scan stats remain) —
    * both fall to the caller's legacy derive.
    */
  def readNext(spark: SparkSession, store: String): Option[Long] =
    readRoot(spark, store).collect {
      case root if root.hasNonNull("nextSeq") =>
        root.path("nextSeq").asLong()
    }

  private def writeNext(
      spark: SparkSession, store: String, next: Long): Unit = {
    val root = readRoot(spark, store).getOrElse(newRoot)
    root.put("nextSeq", next)
    publish(spark, store, root)
  }

  /** Reserve and return the next op seq: sidecar read (one tiny file)
    * or, for a pre-sidecar store, ONE legacy derive via
    * `legacyNext` (a max over the tombstone table — paid once, the
    * sidecar takes over from here). The reservation (next+1) is
    * persisted BEFORE the caller writes anything at the seq.
    */
  def alloc(
      spark: SparkSession, store: String, legacyNext: => Long): Long = {
    val next = readNext(spark, store).getOrElse(legacyNext)
    writeNext(spark, store, next + 1L)
    next
  }

  /** Last-allocated seq (the refresh landing mark): one sidecar read;
    * a sidecar-less store pays the legacy derive ONCE and seeds the
    * sidecar from it — without the seeding, a refresh-only pipeline
    * (no alloc ever firing) would re-run the derive, now an O(store)
    * row-seq scan, on every refresh (review-pass finding, round 13).
    * `base` when nothing was ever allocated.
    */
  def highWater(
      spark: SparkSession, store: String, base: Long,
      legacyNext: => Long): Long = {
    val next = readNext(spark, store).getOrElse {
      val derived = legacyNext
      writeNext(spark, store, derived)
      derived
    }
    math.max(base, next - 1L)
  }

  /** Clear the SEQ COUNTER only (compact clears it together with the
    * tombstone table; the scan stats — which compact updates, not
    * resets — survive). A sidecar left with no other field group is
    * dropped entirely.
    */
  def clearSeq(spark: SparkSession, store: String): Unit =
    readRoot(spark, store).foreach { root =>
      root.remove("nextSeq")
      if (root.isEmpty) clear(spark, store)
      else publish(spark, store, root)
    }

  /** Drop the whole sidecar (an empty-collapsed store takes every
    * field group with it; the LSH family — which carries no scan
    * stats — clears this way on compact too).
    */
  def clear(spark: SparkSession, store: String): Unit =
    JsonSidecar.delete(spark, sidecarPath(store))

  /** The scan-audit stats, if recorded: (current stored rows per cell,
    * build-time cell fractions sorted descending). Absent on stores
    * built before the audit existed, on sink-bootstrapped stores that
    * never ran a build, and after a deliberate sidecar delete — the
    * audited serves then return no audit.
    */
  def readScan(
      spark: SparkSession,
      store: String): Option[(Map[Int, Long], Seq[Double])] =
    readRoot(spark, store).collect {
      case root if root.hasNonNull("scan") =>
        val scan = root.path("scan")
        import scala.jdk.CollectionConverters._
        val cells = scan.path("cells").properties().asScala
          .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
        val fracs = scan.path("buildFracs").elements().asScala
          .map(_.asDouble()).toSeq
        (cells, fracs)
    }

  /** Publish the scan-audit stats (preserving the counter): `cells`
    * is the CURRENT stored-rows-per-cell map (build recomputes it,
    * upsert/refresh fold their batch's per-cell counts in, compact
    * replaces the rewritten cells' entries); `buildFracs` is the
    * designed distribution — cell fractions at build/retrain time,
    * descending — frozen until the next build records fresh ones.
    *
    * Staleness settlement rides the SAME publish (atomic with the
    * stats): `settleOneStale = true` (the upsert/refresh fold)
    * decrements the pending marker its own op raised; the default
    * (build / retrain / compact — recounts that restore exactness for
    * every cell a torn op could have touched) clears it outright.
    */
  def writeScan(
      spark: SparkSession, store: String,
      cells: Map[Int, Long], buildFracs: Seq[Double],
      settleOneStale: Boolean = false): Unit = {
    val root = readRoot(spark, store).getOrElse(newRoot)
    val scan = root.putObject("scan")
    val co = scan.putObject("cells")
    cells.toSeq.sortBy(_._1).foreach { case (c, n) =>
      co.put(c.toString, n)
    }
    val fa = scan.putArray("buildFracs")
    buildFracs.foreach(fa.add)
    if (settleOneStale) {
      val pending = math.max(0, root.path(ScanStaleField).asInt(0) - 1)
      if (pending == 0) { root.remove(ScanStaleField); () }
      else { root.put(ScanStaleField, pending); () }
    } else { root.remove(ScanStaleField); () }
    publish(spark, store, root)
  }

  private val ScanStaleField = "scanStalePending"

  /** Make the upsert/refresh scan-stats crash window VISIBLE (VERDICT
    * r15 #5): called BEFORE the op's row write, this raises a pending
    * marker the post-write stats fold settles in the same publish as
    * the fold ([[writeScan]] `settleOneStale`). A crash between the
    * two leaves the marker raised: [[isScanStale]] then tells the
    * audited serves to report stats-stale — the recorded counts are a
    * LOWER bound, so the drift tripwire's band comparison may sit
    * silently narrow — until a compact's affected-cell recount or a
    * rebuild's full recount restores exactness and clears it. A
    * COUNTER, not a boolean: a later healthy op must not launder a
    * previous crash's staleness (its own mark/settle pair nets zero,
    * the crashed op's +1 survives). No-op on stat-less stores —
    * there is no audit to poison.
    */
  def markScanStale(spark: SparkSession, store: String): Unit =
    readRoot(spark, store).foreach { root =>
      if (root.hasNonNull("scan")) {
        root.put(ScanStaleField, root.path(ScanStaleField).asInt(0) + 1)
        publish(spark, store, root)
      }
    }

  /** True while any marked op's fold has not landed — the audited
    * serves surface this as [[graft.ops.SimilarityOps.IvfScanAudit]]
    * `statsStale`.
    */
  def isScanStale(spark: SparkSession, store: String): Boolean =
    readRoot(spark, store).exists(_.path(ScanStaleField).asInt(0) > 0)
}
