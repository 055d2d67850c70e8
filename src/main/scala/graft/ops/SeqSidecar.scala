package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** O(1) seq high-water sidecar for the set-tombstone index families
  * (LSH band-key table, IVF×PQ cell layout) — the
  * [[graft.movies.PostingIndex]] stats.json pattern ported to the
  * families whose only durable maintenance state used to be the
  * tombstone table itself.
  *
  * Why: every seq-allocating op (upsert/remove) and every refresh
  * high-water probe used to run a max-aggregate job over the
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
  *   - `highWater` is read-only (the refresh path): last allocated
  *     seq, or the family's base seq when nothing was ever allocated.
  *   - compact clears the sidecar together with the tombstone table —
  *     absent sidecar + absent tombstones ⇒ the counter restarts at 0,
  *     which the compact invariant (all rows reset to base seq) makes
  *     safe.
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
  * lose (review-pass fix, round 13).
  *
  * Durability of the sidecar itself: writes go through a tmp file +
  * rename, so the visible file is always a complete JSON document —
  * a crash mid-publish leaves either the previous sidecar or none
  * (none ⇒ the safe legacy derive). A present file MISSING the
  * `nextSeq` field is external corruption and trips a loud require
  * rather than silently restarting the counter at 0.
  */
private[graft] object SeqSidecar {

  private def sidecarPath(store: String): Path =
    new Path(store.stripSuffix("/") + "__maint.json")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The persisted next-seq, if a sidecar exists. A file that exists
    * but carries no `nextSeq` is corruption (the tmp+rename publish
    * never exposes a partial file) — loud, never a silent counter
    * reset to 0.
    */
  def readNext(spark: SparkSession, store: String): Option[Long] = {
    val p = sidecarPath(store)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      // only PARSE failures mean corruption (a torn-write shape the
      // tmp+rename publish should never produce); transport errors
      // (an fs blip) propagate as themselves so an operator is never
      // told to delete a healthy sidecar over a transient fault
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        catch {
          case _: com.fasterxml.jackson.core.JacksonException => null
        }
        finally in.close()
      require(root != null && root.hasNonNull("nextSeq"),
        s"corrupt seq sidecar at ${p}: no readable nextSeq field — " +
          "delete it to fall back to the legacy derive, or rebuild " +
          "the store")
      Some(root.path("nextSeq").asLong())
    }
  }

  private def writeNext(
      spark: SparkSession, store: String, next: Long): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("nextSeq", next)
    val p = sidecarPath(store)
    val tmp = new Path(p.toString + ".tmp")
    val fs = fsOf(spark, p)
    // tmp + rename: the visible sidecar is always a COMPLETE document;
    // a crash anywhere in here leaves the previous sidecar or none —
    // both safe (none ⇒ legacy derive). The delete+rename pair is not
    // atomic on every FS, but its only crash residue is ABSENCE.
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    if (fs.exists(p)) { fs.delete(p, false); () }
    require(fs.rename(tmp, p),
      s"could not publish seq sidecar $p (rename failed)")
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

  /** Drop the sidecar (compact clears it together with the tombstone
    * table; empty-collapse drops it with the store).
    */
  def clear(spark: SparkSession, store: String): Unit = {
    val p = sidecarPath(store)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }
}
